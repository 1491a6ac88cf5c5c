"""URL helpers (reference llm_processor.py:865-877): scheme default,
validity check, domain extraction. Pure functions usable in UDFs and
as column expressions via parse_url-equivalent logic."""

from __future__ import annotations

from urllib.parse import urlparse


def normalize_url(source_url: str) -> str:
    url = source_url.strip()
    if not urlparse(url).scheme:
        url = f"https://{url}"
    return url


def is_valid_url(source_url: str) -> bool:
    parsed = urlparse(source_url)
    return parsed.scheme in {"http", "https"} and bool(parsed.netloc and " " not in parsed.netloc)


def extract_domain(source_url: str) -> str:
    return urlparse(source_url).netloc.lower()
