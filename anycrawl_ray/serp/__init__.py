from .engines import ENGINE_REGISTRY, parse_serp_batch, build_search_url  # noqa: F401
