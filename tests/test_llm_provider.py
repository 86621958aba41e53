"""Provider client conformance (T4 seam): CostTracking, registry
resolution, retry policy and the perform() envelope, mirroring
packages/ai/src/__tests__/llmExtract.test.ts with a fake transport (the
reference tests hit a live provider; no network here)."""

from __future__ import annotations

import pytest

from anycrawl_ray.functions.llm_provider import (
    BaseAgent,
    CostLimitExceededError,
    CostTracking,
    LLMExtractAgent,
    NoObjectGeneratedError,
    ProviderRegistry,
    RetryableProviderError,
    call_with_retries,
)

SCHEMA = {"type": "object",
          "properties": {"company": {"type": "string"},
                         "founded": {"type": "number"}}}

TEST_MD = ("Company Name: TechCorp Solutions Inc. Founded: 2015 "
           "Industry: Software Development, AI Services") * 3

LONG_MD = "\n".join(f"Paragraph {i}: " + "lorem ipsum dolor sit amet " * 40
                    for i in range(60))


class FakeTransport:
    """Records calls; scriptable failures; returns provider-shaped
    results."""

    def __init__(self, fail_times: int = 0, error_cls=RetryableProviderError,
                 usage: dict | None = None):
        self.calls: list[dict] = []
        self.fail_times = fail_times
        self.error_cls = error_cls
        self.usage = usage

    def __call__(self, model, system, messages, schema):
        self.calls.append({"model": model, "system": system,
                           "messages": messages, "schema": schema})
        if self.fail_times > 0:
            self.fail_times -= 1
            raise self.error_cls("transient")
        out = {"object": {"company": "TechCorp", "founded": 2015}}
        if self.usage is not None:
            out["usage"] = self.usage
        return out


def make_registry(transport):
    return ProviderRegistry(
        {"openai": {"enabled": True, "transport": transport},
         "disabled-prov": {"enabled": False, "transport": transport}},
        model_keys={"test-model": "openai/test-model"})


def no_sleep(_):
    pass


# ------------------------------------------------------ CostTracking.ts

class TestCostTracking:
    def test_totals_and_by_type(self):
        ct = CostTracking()
        ct.add_call(type="extract", metadata={}, cost=0.01, model="m",
                    tokens={"input": 100, "output": 20})
        ct.add_call(type="extract", metadata={}, cost=0.02, model="m",
                    tokens={"input": 50, "output": 10})
        ct.add_call(type="merge", metadata={}, cost=0.0, model="m",
                    tokens={"input": 0, "output": 0})
        assert ct.get_total_cost() == pytest.approx(0.03)
        assert ct.get_total_tokens() == {"input": 150, "output": 30,
                                         "total": 180}
        assert ct.get_calls_by_type() == {"extract": 2, "merge": 1}
        assert ct.get_cost_by_type()["extract"] == pytest.approx(0.03)
        assert ct.get_tokens_by_type()["extract"]["total"] == 180

    def test_limit_enforced_after_recording(self):
        ct = CostTracking(limit=0.01)
        ct.add_call(type="extract", metadata={}, cost=0.01, model="m")
        with pytest.raises(CostLimitExceededError,
                           match="Cost limit exceeded"):
            ct.add_call(type="extract", metadata={}, cost=0.001, model="m")
        # reference records the offending call before raising
        assert len(ct.calls) == 2

    def test_summary_format(self):
        ct = CostTracking(limit=1.0)
        ct.add_call(type="extract", metadata={}, cost=0.5, model="m",
                    tokens={"input": 10, "output": 5})
        s = ct.format_summary()
        assert "Total Cost: $0.500000" in s
        assert "Total Tokens: 15 (Input: 10, Output: 5)" in s
        assert "extract: 1 calls" in s
        assert "Used 50.0%" in s
        j = ct.to_json()
        assert j["callCount"] == 1 and j["limit"] == 1.0


# --------------------------------------------- registry + constructor

class TestRegistryResolution:
    def test_provider_model_id(self):
        t = FakeTransport()
        agent = BaseAgent("openai/test-model", make_registry(t))
        assert agent.model == "test-model"
        assert agent.transport is t

    def test_model_key_resolution(self):
        agent = BaseAgent("test-model", make_registry(FakeTransport()))
        assert agent.model == "test-model"

    def test_invalid_model_id(self):
        # mirrors "should handle invalid model id"
        with pytest.raises(ValueError,
                           match="Model invalid-model-id is not found"):
            BaseAgent("invalid-model-id", make_registry(FakeTransport()))

    def test_disabled_provider_not_registered(self):
        with pytest.raises(ValueError, match="is not found"):
            BaseAgent("disabled-prov/x", make_registry(FakeTransport()))

    def test_model_config_lookup_priority(self):
        cfg = {"openai/gpt-4o": {"max_tokens": 1},
               "gpt-4o": {"max_tokens": 2},
               "my_model": {"max_tokens": 3}}
        reg = make_registry(FakeTransport())
        # provider/model beats bare name for a 3-part id
        a = BaseAgent("openrouter/openai/gpt-4o",
                      ProviderRegistry({"openrouter": FakeTransport()}),
                      models_config=cfg)
        assert a.model_config == {"max_tokens": 1}
        # dash/underscore variant matches
        b = BaseAgent("openai/my-model", reg, models_config=cfg)
        assert b.model_config == {"max_tokens": 3}

    def test_default_params_scaling(self):
        agent = BaseAgent("openai/test-model", make_registry(FakeTransport()))
        # test-model: max_input 1000 -> 80% = 800; overlap min(200, 100)
        assert agent.get_default_params() == {
            "max_tokens_input": 800, "max_tokens_output": 500,
            "chunk_overlap": 100}
        caps = agent.get_model_capabilities()
        assert caps["maxInputTokens"] == 1000
        assert caps["inputCostPerToken"] == 1e-06

    def test_token_count_fallback(self):
        agent = BaseAgent("openai/test-model", make_registry(FakeTransport()))
        assert agent.count_tokens("x" * 9) == 3  # ceil(9/4)


# ------------------------------------------------------------- retries

class TestRetryPolicy:
    def test_retryable_error_retried_with_backoff(self):
        sleeps = []
        t = FakeTransport(fail_times=2)
        out = call_with_retries(lambda: t("m", "", [], None),
                                sleeper=sleeps.append)
        assert out["object"]["company"] == "TechCorp"
        assert len(t.calls) == 3
        assert sleeps == [2.0, 4.0]  # exponential backoff

    def test_exhausted_retries_raise(self):
        t = FakeTransport(fail_times=3)
        with pytest.raises(RetryableProviderError):
            call_with_retries(lambda: t("m", "", [], None), sleeper=no_sleep)
        assert len(t.calls) == 3  # 1 + 2 retries

    def test_non_retryable_not_retried(self):
        t = FakeTransport(fail_times=1, error_cls=NoObjectGeneratedError)
        with pytest.raises(NoObjectGeneratedError):
            call_with_retries(lambda: t("m", "", [], None), sleeper=no_sleep)
        assert len(t.calls) == 1


# --------------------------------------------------- perform() envelope

class TestPerform:
    def test_simple_extraction(self):
        # mirrors "Simple Extraction Tests" + "should track costs"
        t = FakeTransport()
        agent = LLMExtractAgent("openai/test-model", make_registry(t),
                                sleeper=no_sleep)
        result = agent.perform(TEST_MD, SCHEMA)
        assert result["data"] == {"company": "TechCorp", "founded": 2015}
        assert result["chunks"] == 1
        assert result["tokens"]["input"] > 0
        assert result["tokens"]["output"] > 0
        assert result["tokens"]["total"] == (result["tokens"]["input"]
                                             + result["tokens"]["output"])
        assert result["cost"] > 0
        assert result["durationMs"] >= 0
        # schema was normalized and forwarded to the transport
        assert t.calls[0]["schema"]["type"] == "object"

    def test_array_input_joined(self):
        # mirrors "Array Input Tests": list joined with newline
        t = FakeTransport()
        agent = LLMExtractAgent("openai/test-model", make_registry(t),
                                sleeper=no_sleep)
        agent.perform(["line one", "line two"], SCHEMA)
        assert "line one\nline two" in t.calls[0]["messages"][0]["content"]

    def test_custom_options_force_chunking(self):
        # mirrors "Custom Options Tests": tiny max input -> chunked path
        t = FakeTransport()
        agent = LLMExtractAgent("openai/test-model", make_registry(t),
                                sleeper=no_sleep)
        result = agent.perform(LONG_MD, SCHEMA, max_tokens_input=100,
                               chunk_overlap=10)
        assert result["chunks"] > 1
        assert len(t.calls) == result["chunks"]
        # merge call recorded at zero cost
        by_type = agent.cost_tracking.get_calls_by_type()
        assert by_type["merge"] == 1
        assert by_type["extract"] == result["chunks"]
        assert agent.cost_tracking.get_cost_by_type()["merge"] == 0.0
        assert result["data"]["company"] == "TechCorp"

    def test_chunk_failure_yields_null_and_merge_continues(self):
        # mirrors chunk-path error handling: failed chunk -> null result
        t = FakeTransport(fail_times=3, error_cls=NoObjectGeneratedError)
        agent = LLMExtractAgent("openai/test-model", make_registry(t),
                                sleeper=no_sleep)
        result = agent.perform(LONG_MD, SCHEMA, max_tokens_input=100)
        # first chunk failed (non-retryable) but merge of the rest works
        assert result["data"] is not None
        assert result["chunks"] > 1

    def test_direct_path_failure_raises(self):
        # mirrors "Error Handling": direct path rethrows
        t = FakeTransport(fail_times=99, error_cls=NoObjectGeneratedError)
        agent = LLMExtractAgent("openai/test-model", make_registry(t),
                                sleeper=no_sleep)
        with pytest.raises(NoObjectGeneratedError):
            agent.perform(TEST_MD, SCHEMA)

    def test_cost_limit_respected(self):
        # mirrors "should respect cost limits"
        t = FakeTransport()
        agent = LLMExtractAgent("openai/test-model", make_registry(t),
                                cost_limit=1e-09, sleeper=no_sleep)
        with pytest.raises(CostLimitExceededError,
                           match="Cost limit exceeded"):
            agent.perform(LONG_MD, SCHEMA, max_tokens_input=100)

    def test_provider_usage_and_cost_preferred(self):
        t = FakeTransport(usage={"promptTokens": 11, "completionTokens": 7,
                                 "cost": 0.123})
        agent = LLMExtractAgent("openai/test-model", make_registry(t),
                                sleeper=no_sleep)
        result = agent.perform(TEST_MD, SCHEMA)
        assert result["tokens"] == {"input": 11, "output": 7, "total": 18}
        assert result["cost"] == pytest.approx(0.123)

    def test_transient_failures_recovered_by_retry(self):
        t = FakeTransport(fail_times=2)  # retryable by default
        agent = LLMExtractAgent("openai/test-model", make_registry(t),
                                sleeper=no_sleep)
        result = agent.perform(TEST_MD, SCHEMA)
        assert result["data"]["company"] == "TechCorp"
        assert len(t.calls) == 3
