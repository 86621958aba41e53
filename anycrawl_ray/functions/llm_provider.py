"""LLM provider client: registry, retry, token/cost accounting.

Port of the reference AI package's provider plumbing onto an injectable
transport (this sandbox has no network — a real deployment plugs an HTTP
transport into the same seam the tests exercise with fakes):

- ``CostTracking``: packages/ai/src/agents/CostTracking.ts:1-131 — call
  log with per-call type/cost/tokens, limit enforcement AFTER appending
  (the offending call is recorded, then the error raised), totals and
  per-type breakdowns, formatted summary;
- ``ProviderRegistry`` / ``get_llm`` / ``get_llm_by_model``:
  ProviderRegistry.ts — providers registered from config (enabled flag,
  key/url from env indirection), ``provider/model`` ids split on the
  first separator, model keys resolved through the enabled-models map,
  with the reference's exact "Model {id} is not found" error;
- ``BaseAgent``: BaseAgent.ts — model-config lookup priority (full id ->
  provider/model of a 3-part id -> bare model name -> -/_ variants),
  ``count_tokens`` (tiktoken is unavailable here, so the reference's own
  documented fallback — ceil(len/4) — is the active path), linear
  per-token cost, default params (80% input budget, min(200, 10%)
  overlap), capability report, ``track_call``;
- ``LLMExtractAgent.perform``: LLMExtract.ts:280-460 — direct path for
  short inputs, chunked path with per-chunk failure -> null (the merge
  still runs, recorded as a zero-cost ``merge`` call), provider-reported
  usage/cost preferred over counted estimates, result envelope
  ``{data, tokens, chunks, cost, durationMs}``;
- retry: the reference's generateObject inherits the ai-SDK default of 2
  retries with exponential backoff on retryable (rate-limit / 5xx /
  network) errors; ``call_with_retries`` reproduces that with an
  injectable sleeper.

The deterministic extractors in stages/llm_extract.py remain the
oracle-checked pipeline path; this module is the real-provider seam.
"""

from __future__ import annotations

import math
import time
from typing import Callable


class ProviderError(Exception):
    """Base transport failure."""

    retryable = False


class RetryableProviderError(ProviderError):
    """Rate limit / 5xx / network — eligible for retry."""

    retryable = True


class NoObjectGeneratedError(ProviderError):
    """ai-SDK NoObjectGeneratedError: the model answered but produced no
    schema-conforming object. Not retryable at the transport layer."""


class CostLimitExceededError(Exception):
    def __init__(self):
        super().__init__("Cost limit exceeded")


class CostTracking:
    """CostTracking.ts:1-131."""

    def __init__(self, limit: float | None = None) -> None:
        self.calls: list[dict] = []
        self.limit = limit

    def add_call(self, *, type: str, metadata: dict, cost: float,
                 model: str, tokens: dict | None = None) -> None:
        self.calls.append({
            "type": type, "metadata": metadata, "cost": cost,
            "model": model, "tokens": tokens,
            "timestamp": time.time() * 1000.0,
        })
        # reference order: the call is recorded first, THEN the limit
        # check fires (CostTracking.ts:33-40)
        if self.limit is not None and self.get_total_cost() > self.limit:
            raise CostLimitExceededError()

    def get_total_cost(self) -> float:
        return sum(c["cost"] or 0 for c in self.calls)

    def get_total_tokens(self) -> dict:
        inp = sum((c["tokens"] or {}).get("input", 0) for c in self.calls)
        out = sum((c["tokens"] or {}).get("output", 0) for c in self.calls)
        return {"input": inp, "output": out, "total": inp + out}

    def get_calls_by_type(self) -> dict:
        counts: dict[str, int] = {}
        for c in self.calls:
            counts[c["type"]] = counts.get(c["type"], 0) + 1
        return counts

    def get_cost_by_type(self) -> dict:
        costs: dict[str, float] = {}
        for c in self.calls:
            costs[c["type"]] = costs.get(c["type"], 0.0) + c["cost"]
        return costs

    def get_tokens_by_type(self) -> dict:
        out: dict[str, dict] = {}
        for c in self.calls:
            t = out.setdefault(c["type"],
                               {"input": 0, "output": 0, "total": 0})
            tok = c["tokens"] or {}
            t["input"] += tok.get("input", 0)
            t["output"] += tok.get("output", 0)
            t["total"] += tok.get("input", 0) + tok.get("output", 0)
        return out

    def format_summary(self) -> str:
        total_tokens = self.get_total_tokens()
        total_cost = self.get_total_cost()
        lines = ["Cost Tracking Summary", "=" * 30,
                 f"Total Cost: ${total_cost:.6f}",
                 f"Total Tokens: {total_tokens['total']} "
                 f"(Input: {total_tokens['input']}, "
                 f"Output: {total_tokens['output']})",
                 f"Total Calls: {len(self.calls)}"]
        by_type = self.get_calls_by_type()
        if by_type:
            lines.append("Stats by Type:")
            costs = self.get_cost_by_type()
            for t, n in by_type.items():
                lines.append(f"   {t}: {n} calls, ${costs.get(t, 0.0):.6f}")
        if self.limit is not None:
            pct = (total_cost / self.limit) * 100 if self.limit else 0.0
            lines.append(f"Cost Limit: ${self.limit} (Used {pct:.1f}%)")
        return "\n".join(lines)

    def to_json(self) -> dict:
        return {
            "calls": self.calls,
            "totalCost": self.get_total_cost(),
            "totalTokens": self.get_total_tokens(),
            "callCount": len(self.calls),
            "callsByType": self.get_calls_by_type(),
            "costsByType": self.get_cost_by_type(),
            "tokensByType": self.get_tokens_by_type(),
            "limit": self.limit,
        }


# Representative model-config rows (the reference ships a generated
# 21k-line models-config.ts; the lookup/pricing mechanics only need the
# shape — deployments pass their own table)
DEFAULT_MODELS_CONFIG: dict[str, dict] = {
    "gpt-4o-mini": {
        "max_input_tokens": 128_000, "max_output_tokens": 16_384,
        "input_cost_per_token": 1.5e-07, "output_cost_per_token": 6.0e-07,
        "supports_vision": True, "supports_function_calling": True,
        "supports_native_streaming": True,
    },
    "gpt-4o": {
        "max_input_tokens": 128_000, "max_output_tokens": 16_384,
        "input_cost_per_token": 2.5e-06, "output_cost_per_token": 1.0e-05,
        "supports_vision": True, "supports_function_calling": True,
        "supports_native_streaming": True,
    },
    "test-model": {  # deterministic round numbers for unit tests
        "max_input_tokens": 1000, "max_output_tokens": 500,
        "input_cost_per_token": 1e-06, "output_cost_per_token": 2e-06,
        "supports_function_calling": True,
    },
}


class ProviderRegistry:
    """ProviderRegistry.ts: named providers -> transport callables.

    A transport is ``fn(model: str, system: str, messages: list,
    schema: dict | None) -> {"object": ..., "usage": {...}?}`` — the
    shape generateObject's result exposes. Config rows mirror the
    reference: ``{enabled, transport}`` (apiKey/baseURL resolution is the
    HTTP transport's concern and stays behind this seam)."""

    SEPARATOR = "/"

    def __init__(self, providers: dict[str, dict] | None = None,
                 model_keys: dict[str, str] | None = None) -> None:
        self._providers: dict[str, Callable] = {}
        # model key -> enabled "provider/model" id (helper.ts
        # getEnabledModelIdByModelKey)
        self._model_keys = dict(model_keys or {})
        for name, cfg in (providers or {}).items():
            if isinstance(cfg, dict):
                if not cfg.get("enabled", True):
                    continue
                transport = cfg.get("transport")
            else:
                transport = cfg
            if callable(transport):
                self._providers[name] = transport

    def get_llm(self, model_id: str) -> tuple[Callable, str]:
        """'provider/model' -> (transport, model). Reference error text."""
        if self.SEPARATOR not in model_id:
            raise ValueError(f"Model {model_id} is not found")
        provider, model = model_id.split(self.SEPARATOR, 1)
        transport = self._providers.get(provider)
        if transport is None:
            raise ValueError(f"Model {model_id} is not found")
        return transport, model

    def get_llm_by_model(self, model_key: str) -> tuple[Callable, str]:
        full = self._model_keys.get(model_key)
        if not full:
            raise ValueError(f"Model {model_key} is not found")
        return self.get_llm(full)


def call_with_retries(fn: Callable, max_retries: int = 2,
                      base_delay: float = 2.0,
                      sleeper: Callable[[float], None] = time.sleep):
    """ai-SDK default retry policy around one provider call: up to
    ``max_retries`` retries (so max_retries+1 attempts), exponential
    backoff (base 2s doubling), only for retryable errors."""
    attempt = 0
    while True:
        try:
            return fn()
        except ProviderError as exc:
            if not exc.retryable or attempt >= max_retries:
                raise
            sleeper(base_delay * (2 ** attempt))
            attempt += 1


class BaseAgent:
    """BaseAgent.ts token/cost/config core over an injectable registry."""

    def __init__(self, model_id: str, registry: ProviderRegistry,
                 cost_limit: float | None = None,
                 models_config: dict | None = None) -> None:
        self.model_id = model_id
        if self.SEPARATOR_IN(model_id):
            self.transport, self.model = registry.get_llm(model_id)
        else:
            self.transport, self.model = registry.get_llm_by_model(model_id)
        self.cost_tracking = CostTracking(cost_limit)
        self._models_config = models_config or DEFAULT_MODELS_CONFIG
        self.model_config = self.get_model_config(model_id)

    @staticmethod
    def SEPARATOR_IN(model_id: str) -> bool:
        return "/" in model_id

    def get_model_config(self, model_id: str) -> dict | None:
        """BaseAgent.ts:56-96 lookup priority: full id, provider/model
        (for 3-part ids), bare model name, -/_ variants."""
        keys = [model_id]
        if "/" in model_id:
            parts = model_id.split("/")
            if len(parts) >= 3:
                keys.append("/".join(parts[-2:]))
            name = parts[-1]
            if name:
                keys.extend([name, name.replace("-", "_", 1),
                             name.replace("_", "-", 1)])
        for key in keys:
            if key and key in self._models_config:
                return self._models_config[key]
        return None

    def count_tokens(self, text: str) -> int:
        """tiktoken is not available in this environment; the reference's
        own fallback path (1 token ~= 4 chars, BaseAgent.ts:118-121) is
        the active estimator."""
        return math.ceil(len(text) / 4)

    def calculate_cost(self, input_tokens: int, output_tokens: int) -> float:
        if not self.model_config:
            return 0.0
        return ((self.model_config.get("input_cost_per_token") or 0)
                * input_tokens
                + (self.model_config.get("output_cost_per_token") or 0)
                * output_tokens)

    def get_default_params(self) -> dict:
        if not self.model_config:
            return {"max_tokens_input": 4000, "max_tokens_output": 2000,
                    "chunk_overlap": 200}
        cfg = self.model_config
        max_in = cfg.get("max_input_tokens") or cfg.get("max_tokens") or 4000
        max_out = cfg.get("max_output_tokens") or cfg.get("max_tokens") or 2000
        return {
            "max_tokens_input": int(max_in * 0.8),
            "max_tokens_output": max_out,
            "chunk_overlap": min(200, int(max_in * 0.1)),
        }

    def get_model_capabilities(self) -> dict:
        cfg = self.model_config or {}
        max_in = cfg.get("max_input_tokens") or cfg.get("max_tokens") or 4000
        max_out = cfg.get("max_output_tokens") or cfg.get("max_tokens") or 2000
        return {
            "maxInputTokens": max_in,
            "maxOutputTokens": max_out,
            "supportsVision": cfg.get("supports_vision", False),
            "supportsFunctionCalling": cfg.get("supports_function_calling",
                                               False),
            "supportsStreaming": cfg.get("supports_native_streaming", False),
            "inputCostPerToken": cfg.get("input_cost_per_token", 0),
            "outputCostPerToken": cfg.get("output_cost_per_token", 0),
        }

    def track_call(self, type: str, metadata: dict, input_tokens: int,
                   output_tokens: int) -> None:
        self.cost_tracking.add_call(
            type=type, metadata=metadata,
            cost=self.calculate_cost(input_tokens, output_tokens),
            model=self.model_id,
            tokens={"input": input_tokens, "output": output_tokens})

    def extract_usage_tokens(self, result: dict, prompt: str, obj) -> dict:
        """Provider-reported usage wins; otherwise count locally
        (LLMExtract.ts extractUsageTokens)."""
        usage = (result or {}).get("usage") or {}
        # explicit None checks: a provider-reported 0 is a real count
        inp = usage.get("promptTokens")
        if inp is None:
            inp = usage.get("input_tokens")
        out = usage.get("completionTokens")
        if out is None:
            out = usage.get("output_tokens")
        if inp is None:
            inp = self.count_tokens(prompt)
        if out is None:
            import json
            out = self.count_tokens(json.dumps(obj, default=str))
        return {
            "inputTokens": int(inp), "outputTokens": int(out),
            "totalTokens": int(inp) + int(out),
            "providerCost": usage.get("cost"),
            "rawUsage": usage or None,
        }


class LLMExtractAgent(BaseAgent):
    """LLMExtract.ts perform() flow over the transport seam. Chunking and
    merge reuse the oracle-checked kernels in stages/llm_extract.py."""

    def __init__(self, model_id: str, registry: ProviderRegistry,
                 cost_limit: float | None = None,
                 models_config: dict | None = None,
                 system_prompt: str = "",
                 sleeper: Callable[[float], None] = time.sleep) -> None:
        super().__init__(model_id, registry, cost_limit, models_config)
        self.system_prompt = system_prompt
        self._sleeper = sleeper

    def _generate(self, prompt: str, system: str, schema: dict | None):
        return call_with_retries(
            lambda: self.transport(self.model, system,
                                   [{"role": "user", "content": prompt}],
                                   schema),
            sleeper=self._sleeper)

    def perform(self, text, schema: dict | None = None, *,
                prompt: str | None = None, system_prompt: str | None = None,
                max_tokens_input: int | None = None,
                chunk_overlap: int | None = None) -> dict:
        from ..functions.json_schema import normalize_schema
        from ..stages.llm_extract import merge_results, split_text_into_chunks

        t0 = time.monotonic()
        defaults = self.get_default_params()
        max_in = max_tokens_input or defaults["max_tokens_input"]
        overlap = (chunk_overlap if chunk_overlap is not None
                   else defaults["chunk_overlap"])
        normalized = normalize_schema(schema) if schema else None
        system = system_prompt or self.system_prompt or ""

        input_text = "\n".join(text) if isinstance(text, list) else text
        input_tokens = self.count_tokens(input_text)

        if input_tokens <= max_in:
            full_prompt = _build_prompt(prompt, input_text)
            result = self._generate(full_prompt, system, normalized)
            usage = self.extract_usage_tokens(result, full_prompt + system,
                                              result.get("object"))
            self.cost_tracking.add_call(
                type="extract", metadata={"direct": True},
                cost=(usage["providerCost"]
                      if isinstance(usage["providerCost"], (int, float))
                      else self.calculate_cost(usage["inputTokens"],
                                               usage["outputTokens"])),
                model=self.model_id,
                tokens={"input": usage["inputTokens"],
                        "output": usage["outputTokens"]})
            return {
                "data": result.get("object"),
                "tokens": {"input": usage["inputTokens"],
                           "output": usage["outputTokens"],
                           "total": usage["totalTokens"]},
                "chunks": 1,
                "cost": self.cost_tracking.get_total_cost(),
                "durationMs": (time.monotonic() - t0) * 1000.0,
            }

        # chunked path: one failed chunk -> null, merge still runs
        chunks = split_text_into_chunks(input_text, max_in, overlap,
                                        self.count_tokens)
        all_results = []
        for i, chunk_info in enumerate(chunks):
            full_prompt = _build_prompt(prompt, chunk_info["chunk"])
            try:
                result = self._generate(full_prompt, system, normalized)
            except (ProviderError, CostLimitExceededError) as exc:
                if isinstance(exc, CostLimitExceededError):
                    raise
                all_results.append(None)
                continue
            obj = result.get("object")
            all_results.append(obj)
            usage = self.extract_usage_tokens(result, full_prompt + system,
                                              obj)
            self.cost_tracking.add_call(
                type="extract",
                metadata={"direct": False, "chunkIndex": i + 1,
                          "totalChunks": len(chunks)},
                cost=(usage["providerCost"]
                      if isinstance(usage["providerCost"], (int, float))
                      else self.calculate_cost(usage["inputTokens"],
                                               usage["outputTokens"])),
                model=self.model_id,
                tokens={"input": usage["inputTokens"],
                        "output": usage["outputTokens"]})
        self.cost_tracking.add_call(
            type="merge", metadata={"chunksCount": len(chunks)},
            cost=0.0, model=self.model_id,
            tokens={"input": 0, "output": 0})
        merged = merge_results(all_results)
        totals = self.cost_tracking.get_total_tokens()
        return {
            "data": merged,
            "tokens": totals,
            "chunks": len(chunks),
            "cost": self.cost_tracking.get_total_cost(),
            "durationMs": (time.monotonic() - t0) * 1000.0,
        }


def _build_prompt(user_prompt: str | None, content: str) -> str:
    base = f"{user_prompt}\n\n" if user_prompt else ""
    return f"{base}Content:\n{content}"


class OpenAICompatTransport:
    """REAL HTTP transport for any OpenAI-compatible ``/chat/completions``
    endpoint — the public wire protocol the reference's ai-SDK providers
    (openai, openrouter, self-hosted vLLM/ollama gateways) speak. This
    moves T4 from "documented seam" to a concrete transport: plug it into
    ``ProviderRegistry`` as ``{"openai": {"transport":
    OpenAICompatTransport(base_url, api_key)}}`` and everything above the
    seam (retry policy, cost tracking, chunk merge, json_options) runs
    unchanged over a live socket (loopback-tested in
    tests/test_llm_transport.py; no external network in this sandbox).

    Error mapping mirrors HttpClient.ts semantics: 408/409/429/5xx and
    socket errors raise RetryableProviderError (eligible for
    ``call_with_retries`` backoff), other HTTP errors raise ProviderError;
    a 200 whose content is not schema-conforming JSON raises
    NoObjectGeneratedError (ai-SDK's NoObjectGeneratedError)."""

    RETRYABLE_STATUSES = (408, 409, 429)

    def __init__(self, base_url: str, api_key: str = "",
                 timeout: float = 120.0) -> None:
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.timeout = timeout

    def __call__(self, model: str, system: str, messages: list,
                 schema: dict | None):
        import json as _json
        import urllib.error
        import urllib.request

        body = {"model": model,
                "messages": ([{"role": "system", "content": system}]
                             if system else []) + list(messages)}
        if schema is not None:
            body["response_format"] = {
                "type": "json_schema",
                "json_schema": {"name": "extraction", "strict": True,
                                "schema": schema}}
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        req = urllib.request.Request(
            self.base_url + "/chat/completions",
            data=_json.dumps(body).encode(), method="POST", headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                payload = _json.loads(resp.read())
        except urllib.error.HTTPError as e:
            detail = e.read().decode(errors="replace")[:200]
            msg = f"HTTP {e.code} from {self.base_url}: {detail}"
            if e.code in self.RETRYABLE_STATUSES or e.code >= 500:
                raise RetryableProviderError(msg) from e
            raise ProviderError(msg) from e
        except OSError as e:
            raise RetryableProviderError(
                f"network error reaching {self.base_url}: {e}") from e

        try:
            content = payload["choices"][0]["message"]["content"]
        except (KeyError, IndexError, TypeError) as e:
            raise NoObjectGeneratedError(
                "provider response has no choices[0].message.content") from e
        if schema is not None:
            try:
                obj = _json.loads(content)
            except (TypeError, _json.JSONDecodeError) as e:
                raise NoObjectGeneratedError(
                    "model output is not valid JSON") from e
        else:
            obj = content
        usage = payload.get("usage") or {}
        out = {"object": obj}
        if usage:
            out["usage"] = {"input_tokens": usage.get("prompt_tokens"),
                            "output_tokens": usage.get("completion_tokens"),
                            "cost": usage.get("cost")}
        return out
