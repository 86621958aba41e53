"""Live-socket tests for OpenAICompatTransport: a stdlib stub server
speaking the OpenAI chat-completions wire protocol on a loopback port
drives the REAL urllib transport through success, schema enforcement,
rate-limit retry, error mapping and the full LLMExtractAgent flow —
the T4 seam's socket coverage, mirroring test_http_fetcher.py (S5) and
test_api.py's server tests (S1). No external network involved."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from anycrawl_ray.functions.llm_provider import (
    LLMExtractAgent,
    NoObjectGeneratedError,
    OpenAICompatTransport,
    ProviderError,
    ProviderRegistry,
    RetryableProviderError,
    call_with_retries,
)


class _Stub(http.server.BaseHTTPRequestHandler):
    """Scriptable /chat/completions endpoint. Class attrs configure the
    next responses; every request is recorded."""

    script: list = []          # list of (status, payload_dict_or_str)
    requests: list = []

    def do_POST(self):
        length = int(self.headers.get("Content-Length") or 0)
        body = json.loads(self.rfile.read(length))
        type(self).requests.append(
            {"path": self.path, "body": body,
             "auth": self.headers.get("Authorization")})
        status, payload = (self.script.pop(0) if self.script
                           else (200, _ok_payload("{}")))
        data = (payload if isinstance(payload, (bytes,))
                else json.dumps(payload).encode()
                if not isinstance(payload, str) else payload.encode())
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):
        pass


def _ok_payload(content: str, usage: dict | None = None) -> dict:
    p = {"choices": [{"message": {"role": "assistant",
                                  "content": content}}]}
    if usage is not None:
        p["usage"] = usage
    return p


@pytest.fixture()
def stub():
    _Stub.script = []
    _Stub.requests = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Stub)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _Stub
    srv.shutdown()
    srv.server_close()


SCHEMA = {"type": "object", "properties": {"title": {"type": "string"}}}


def test_success_schema_and_usage(stub):
    base, s = stub
    s.script = [(200, _ok_payload(json.dumps({"title": "Doc"}),
                                  {"prompt_tokens": 11,
                                   "completion_tokens": 3}))]
    t = OpenAICompatTransport(base, api_key="sk-test")
    out = t("m1", "sys", [{"role": "user", "content": "extract"}], SCHEMA)
    assert out["object"] == {"title": "Doc"}
    assert out["usage"] == {"input_tokens": 11, "output_tokens": 3,
                            "cost": None}
    req = s.requests[0]
    assert req["path"] == "/chat/completions"
    assert req["auth"] == "Bearer sk-test"
    assert req["body"]["model"] == "m1"
    assert req["body"]["messages"][0] == {"role": "system",
                                          "content": "sys"}
    assert req["body"]["response_format"]["json_schema"]["schema"] == SCHEMA


def test_rate_limit_retries_then_succeeds(stub):
    base, s = stub
    s.script = [(429, {"error": "slow down"}),
                (200, _ok_payload("plain answer"))]
    t = OpenAICompatTransport(base)
    sleeps = []
    out = call_with_retries(lambda: t("m", "", [{"role": "user",
                                                 "content": "q"}], None),
                            sleeper=sleeps.append)
    assert out["object"] == "plain answer"
    assert len(s.requests) == 2 and sleeps == [2.0]


def test_persistent_500_exhausts_retries(stub):
    base, s = stub
    s.script = [(500, {"error": "boom"})] * 3
    t = OpenAICompatTransport(base)
    with pytest.raises(RetryableProviderError):
        call_with_retries(lambda: t("m", "", [], None),
                          sleeper=lambda s_: None)
    assert len(s.requests) == 3  # max_retries=2 -> 3 attempts


def test_client_error_not_retried(stub):
    base, s = stub
    s.script = [(400, {"error": "bad request"})] * 2
    t = OpenAICompatTransport(base)
    with pytest.raises(ProviderError) as ei:
        call_with_retries(lambda: t("m", "", [], None),
                          sleeper=lambda s_: None)
    assert not ei.value.retryable and len(s.requests) == 1


def test_non_json_object_raises_no_object(stub):
    base, s = stub
    s.script = [(200, _ok_payload("not json at all"))]
    t = OpenAICompatTransport(base)
    with pytest.raises(NoObjectGeneratedError):
        t("m", "", [], SCHEMA)


def test_connection_refused_is_retryable():
    t = OpenAICompatTransport("http://127.0.0.1:9", timeout=0.5)
    with pytest.raises(RetryableProviderError):
        t("m", "", [], None)


def test_llm_extract_agent_over_live_socket(stub):
    """Full agent flow (chunking, retry policy, usage->cost tracking)
    over the real wire: everything above the seam unchanged."""
    base, s = stub
    s.script = [(429, {"error": "rate"}),
                (200, _ok_payload(json.dumps({"title": "Live"}),
                                  {"prompt_tokens": 7,
                                   "completion_tokens": 2}))]
    reg = ProviderRegistry({"openai": {
        "transport": OpenAICompatTransport(base, api_key="k")}})
    agent = LLMExtractAgent("openai/test-model", reg,
                            sleeper=lambda s_: None)
    res = agent.perform("short document text", schema=SCHEMA)
    assert res["data"] == {"title": "Live"}
    assert len(s.requests) == 2  # 429 then success
    tokens = agent.cost_tracking.get_total_tokens()
    assert tokens["input"] == 7 and tokens["output"] == 2
