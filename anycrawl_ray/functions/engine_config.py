"""Engine-pool option validation — ConfigValidator port
(packages/scrape/src/core/ConfigValidator.ts:13-72).

Bounds for the Crawlee engine options the reference accepts per engine
pool; mirrored by its test matrix (ConfigValidator.test.ts).
"""

from __future__ import annotations

def validate_engine_options(options: dict) -> None:
    """ConfigValidator.validate port (packages/scrape/src/core/
    ConfigValidator.ts:13-72): engine-pool option bounds. Raises ValueError
    with the reference's message on the first violation; every field is
    optional (empty options pass)."""
    prefix = "EngineOptions validation failed: "
    mn = options.get("min_concurrency")
    mx = options.get("max_concurrency")
    if mn is not None and mn < 1:
        raise ValueError(prefix + "minConcurrency must be at least 1")
    if mx is not None and mx < 1:
        raise ValueError(prefix + "maxConcurrency must be at least 1")
    if mn is not None and mx is not None and mn > mx:
        raise ValueError(prefix + "minConcurrency cannot be greater than "
                                  "maxConcurrency")
    for key, msg in (("request_handler_timeout_secs",
                      "requestHandlerTimeoutSecs must be at least 1"),
                     ("max_request_timeout",
                      "maxRequestTimeout must be at least 1"),
                     ("navigation_timeout_secs",
                      "navigationTimeoutSecs must be at least 1"),
                     ("max_requests_per_crawl",
                      "maxRequestsPerCrawl must be at least 1")):
        v = options.get(key)
        if v is not None and v < 1:
            raise ValueError(prefix + msg)
    for key, msg in (("max_request_retries",
                      "maxRequestRetries cannot be negative"),
                     ("max_session_rotations",
                      "maxSessionRotations cannot be negative")):
        v = options.get(key)
        if v is not None and v < 0:
            raise ValueError(prefix + msg)
    q = options.get("request_queue_name")
    if q is not None and not isinstance(q, str):
        raise ValueError(prefix + "requestQueueName must be a string")
