"""Model-provider registry + key gating (SURVEY §2 / reference
utils/model_utils.py:8-115).

Same contract as the reference — providers unlock by environment
credentials, each exposes chat + embedding model lists, a model name
resolves to its provider (with an explicit "provider/model" override),
and UI surfaces get (description, key) choice pairs — restructured
declaratively: one PROVIDERS spec table instead of imperative dict
mutation inside check_api_key(), with the environment injectable for
tests and pricing text derived from metrics.TOKEN_PRICES so the cost
table has a single source of truth.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from ctinexus_spark.metrics import TOKEN_PRICES


@dataclass(frozen=True)
class ProviderSpec:
    name: str
    # provider is available when ANY of these env vars is non-empty
    env_keys: tuple[str, ...]
    chat_models: tuple[str, ...]
    embedding_models: tuple[str, ...] = ()
    default_base_url: str | None = None
    base_url_env: str | None = None
    extra_prices: dict = field(default_factory=dict)


PROVIDERS: tuple[ProviderSpec, ...] = (
    ProviderSpec(
        name="OpenAI",
        env_keys=("OPENAI_API_KEY", "CUSTOM_BASE_URL"),
        chat_models=(
            "gpt-4.1-mini", "gpt-4.1", "o4-mini", "o3-mini", "o3",
            "o3-pro", "gpt-4o", "gpt-4", "gpt-4-turbo", "gpt-3.5-turbo",
            "gpt-4o-mini", "gpt-4.1-nano",
        ),
        embedding_models=(
            "text-embedding-3-large", "text-embedding-3-small",
            "text-embedding-ada-002",
        ),
        default_base_url="https://api.openai.com/v1",
        base_url_env="CUSTOM_BASE_URL",
    ),
    ProviderSpec(
        name="Gemini",
        env_keys=("GEMINI_API_KEY",),
        chat_models=(
            "gemini-2.5-flash-lite", "gemini-2.0-flash",
            "gemini-2.0-flash-lite",
        ),
        embedding_models=("gemini-embedding-001",),
    ),
    ProviderSpec(
        name="AWS",
        env_keys=("AWS_ACCESS_KEY_ID",),
        chat_models=(
            "anthropic.claude-3-7-sonnet", "anthropic.claude-3-5-sonnet",
            "anthropic.claude-3-5-haiku", "anthropic.claude-3-haiku",
            "amazon.nova-micro-v1:0", "amazon.nova-lite-v1:0",
            "amazon.nova-pro-v1:0", "deepseek.r1-v1:0",
            "mistral.pixtral-large-2502-v1:0",
            "meta.llama3-1-8b-instruct-v1:0",
            "meta.llama3-1-70b-instruct-v1:0",
            "meta.llama3-2-11b-instruct-v1:0",
            "meta.llama3-3-70b-instruct-v1:0",
        ),
        embedding_models=("amazon.titan-embed-text-v2:0",),
        # 3-3-70b is priced like 3-1-70b (reference cost.json has no row)
        extra_prices={"meta.llama3-3-70b-instruct-v1:0": (7.5e-07, 3e-06)},
    ),
    ProviderSpec(
        name="Ollama",
        env_keys=("OLLAMA_BASE_URL",),
        chat_models=(
            "llama3.1:8b", "llama3.1:70b", "llama3:8b", "mistral:7b",
            "mixtral:8x7b", "qwen2.5:7b", "qwen2.5:14b", "phi3:14b",
            "gemma2:9b", "gemma2:27b",
        ),
        embedding_models=(
            "nomic-embed-text", "mxbai-embed-large", "all-minilm",
            "snowflake-arctic-embed",
        ),
        base_url_env="OLLAMA_BASE_URL",
    ),
)


def _env(env: dict | None) -> dict:
    return os.environ if env is None else env


def available_providers(env: dict | None = None) -> list[ProviderSpec]:
    """Providers whose credentials are present — the check_api_key()
    gate, returning the specs instead of mutating module globals."""
    e = _env(env)
    return [p for p in PROVIDERS if any((e.get(k) or "").strip() for k in p.env_keys)]


def check_api_key(env: dict | None = None) -> bool:
    return bool(available_providers(env))


def resolve_provider(
    model: str | None = None,
    embedding_model: str | None = None,
    env: dict | None = None,
) -> str | None:
    """'provider/model' prefix wins; otherwise look the bare name up in
    the AVAILABLE providers' model lists (chat first, then embedding),
    mirroring get_model_provider()."""
    for name in (model, embedding_model):
        if name and "/" in name:
            return name.split("/", 1)[0]
    avail = available_providers(env)
    for p in avail:
        if model in p.chat_models:
            return p.name
    for p in avail:
        if embedding_model in p.embedding_models:
            return p.name
    return None


def _describe(model: str, spec: ProviderSpec) -> str:
    prices = {**TOKEN_PRICES, **spec.extra_prices}
    if model not in prices:
        return f"{model} (pricing n/a)"
    i, o = prices[model]
    if i == 0.0 and o == 0.0:
        return f"{model} (free)"
    if o == 0.0:
        return f"{model} (${i * 1e6:g}/Mtok)"
    return f"{model} (${i * 1e6:g} • ${o * 1e6:g} per Mtok)"


def model_choices(provider: str | None, env: dict | None = None) -> list[tuple[str, str]]:
    """(description, key) pairs for a provider's chat models — the
    dropdown contract of get_model_choices()."""
    for p in available_providers(env):
        if p.name == provider:
            return [(_describe(m, p), m) for m in p.chat_models]
    return []


def embedding_model_choices(provider: str | None, env: dict | None = None) -> list[tuple[str, str]]:
    for p in available_providers(env):
        if p.name == provider:
            return [(_describe(m, p), m) for m in p.embedding_models]
    return []


def base_url_for(provider: str, env: dict | None = None) -> str | None:
    """Endpoint HttpModelClient should target for a provider: the
    provider's env override when set, else its public default."""
    e = _env(env)
    for p in PROVIDERS:
        if p.name == provider:
            if p.base_url_env and (e.get(p.base_url_env) or "").strip():
                return e[p.base_url_env].strip()
            return p.default_base_url
    return None
