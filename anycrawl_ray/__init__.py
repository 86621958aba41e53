"""anycrawl_ray — a Ray-Data-native rebuild of AnyCrawl's crawl/scrape/search engine.

Reference: xienanzheng/AnyCrawl (TypeScript, at /root/reference — studied for
semantics only; no code copied). Architecture is Ray-Data-first:

- fetch/parse/extract stages are ``Dataset.map_batches`` over Arrow batches;
- the URL frontier + seen-set is a sharded pool of Ray actors
  (``anycrawl_ray.state.frontier``) holding per-host FIFO queues and a
  partitioned cuckoo filter;
- crawls run as epoch-synchronous BFS waves driven by
  ``anycrawl_ray.pipelines.crawl``;
- documents are interleaved text+media span tables
  ``(doc_id: string, spans: list<struct<kind,text,media_ref,offset>>)``
  per BASELINE.json's input_hint.

Nothing in this package calls ``ray.init()`` — the caller owns the session.
"""

__version__ = "0.1.0"
