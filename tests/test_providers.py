"""Provider registry / key gating — env injected, no network, no
Spark. Contract mirror of reference utils/model_utils.py:8-115."""

from ctinexus_spark.providers import (
    PROVIDERS,
    available_providers,
    base_url_for,
    check_api_key,
    embedding_model_choices,
    model_choices,
    resolve_provider,
)


def test_no_credentials_no_providers():
    assert available_providers({}) == []
    assert not check_api_key({})
    assert model_choices("OpenAI", {}) == []


def test_each_env_key_unlocks_its_provider():
    cases = {
        "OPENAI_API_KEY": "OpenAI",
        "CUSTOM_BASE_URL": "OpenAI",   # custom endpoint counts as OpenAI-shaped
        "GEMINI_API_KEY": "Gemini",
        "AWS_ACCESS_KEY_ID": "AWS",
        "OLLAMA_BASE_URL": "Ollama",
    }
    for key, provider in cases.items():
        names = [p.name for p in available_providers({key: "x"})]
        assert names == [provider], (key, names)
    # whitespace-only values do NOT unlock (reference strips)
    assert available_providers({"OPENAI_API_KEY": "  "}) == []


def test_model_counts_match_reference_surface():
    by_name = {p.name: p for p in PROVIDERS}
    assert len(by_name["OpenAI"].chat_models) == 12
    assert len(by_name["OpenAI"].embedding_models) == 3
    assert len(by_name["Gemini"].chat_models) == 3
    assert len(by_name["AWS"].chat_models) == 13
    assert len(by_name["Ollama"].chat_models) == 10
    assert len(by_name["Ollama"].embedding_models) == 4


def test_resolve_provider_prefix_and_lookup():
    env = {"OPENAI_API_KEY": "x", "AWS_ACCESS_KEY_ID": "y"}
    assert resolve_provider("gpt-4o", env=env) == "OpenAI"
    assert resolve_provider("anthropic.claude-3-5-haiku", env=env) == "AWS"
    assert resolve_provider(embedding_model="text-embedding-3-small", env=env) == "OpenAI"
    # explicit provider/model prefix wins without any lookup
    assert resolve_provider("Ollama/llama3.1:8b", env={}) == "Ollama"
    # unavailable provider's model resolves to None
    assert resolve_provider("gemini-2.0-flash", env=env) is None
    assert resolve_provider("nope", env=env) is None


def test_choices_are_desc_key_pairs_with_pricing():
    env = {"OPENAI_API_KEY": "x"}
    chat = dict(model_choices("OpenAI", env))
    assert set(chat.values()) == set(
        p for p in [s for s in PROVIDERS if s.name == "OpenAI"][0].chat_models
    )
    # pricing text derives from TOKEN_PRICES (single source of truth)
    desc = [d for d, k in model_choices("OpenAI", env) if k == "gpt-4.1"][0]
    assert "$2" in desc and "$8" in desc
    emb = [d for d, k in embedding_model_choices("OpenAI", env) if k == "text-embedding-3-small"][0]
    assert "$0.02" in emb
    free = [d for d, k in model_choices("Ollama", {"OLLAMA_BASE_URL": "u"}) if k == "mistral:7b"][0]
    assert "free" in free


def test_base_url_override_and_defaults():
    assert base_url_for("OpenAI", {}) == "https://api.openai.com/v1"
    assert base_url_for("OpenAI", {"CUSTOM_BASE_URL": "http://proxy:8080/v1"}) == "http://proxy:8080/v1"
    assert base_url_for("Ollama", {"OLLAMA_BASE_URL": "http://localhost:11434"}) == "http://localhost:11434"
    assert base_url_for("Ollama", {}) is None
    assert base_url_for("NoSuch", {}) is None


def test_aws_llama33_priced_like_llama31():
    env = {"AWS_ACCESS_KEY_ID": "x"}
    d33 = [d for d, k in model_choices("AWS", env) if k == "meta.llama3-3-70b-instruct-v1:0"][0]
    d31 = [d for d, k in model_choices("AWS", env) if k == "meta.llama3-1-70b-instruct-v1:0"][0]
    assert d33.split("(")[1] == d31.split("(")[1]
