"""Deterministic synthetic corpus generator (input_hint shape).

FIXTURES.md §1 synthesis rules: fixed seed, ≥3 orders of magnitude of
per-domain row counts (hot-domain skew), some null-text + html rows,
some non-English rows, duplicate-url rows. Used by skew tests and CTI-
mode benchmarks; no external data (everything derives from the seed
and the inline fragment bank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# a zipf-ish domain weight table: domain i gets weight ~ 1/(i+1)^2
N_DOMAINS = 50

_FRAGMENTS = [
    "{actor} operators exploited CVE-20{yy}-{cve} on exposed appliances.",
    "The actor beaconed to 10.{a}.{b}.{c} and staged payloads on cdn{a}.example-{b}.com.",
    "Phishing emails from intruder{a}@malicious-{b}.net delivered the loader.",
    "Victims in the {sector} sector paid ${m} million in January 20{yy}.",
    "The payload hash was {hash}.",
    "Lateral movement used stolen credentials and PsExec.",
    "Exfiltration over Tor preceded encryption of file servers.",
]

_ACTORS = ["Akira", "LockBit", "BlackCat", "Conti", "Ryuk", "Cl0p", "Vice Society", "Royal"]
_SECTORS = ["financial", "healthcare", "education", "energy", "manufacturing"]


def synthesize_documents(
    spark: SparkSession,
    n_docs: int = 10_000,
    seed: int = 42,
    frac_null_text: float = 0.01,
    frac_non_english: float = 0.02,
    frac_dup_url: float = 0.005,
    hot_frac: float | None = None,
) -> DataFrame:
    """(url, warc_ts, html, text, lang) with hot-domain skew.

    hot_frac overrides the default zipf-ish layout: exactly that
    fraction of docs lands on domain 0 (the hot-domain scenario the
    north_rule names), the rest spread uniformly over the remaining
    domains. hot_frac=0.0 gives a fully uniform layout — the control
    corpus for skew benchmarks (same texts, different domain map)."""
    import hashlib

    def h(i: int, tag: str) -> int:
        return int.from_bytes(hashlib.md5(f"{seed}:{tag}:{i}".encode()).digest()[:4], "big")

    def mk_text(i: int) -> str:
        parts = []
        for j in range(3 + h(i, "n") % 4):
            frag = _FRAGMENTS[h(i * 7 + j, "frag") % len(_FRAGMENTS)]
            parts.append(
                frag.format(
                    actor=_ACTORS[h(i + j, "actor") % len(_ACTORS)],
                    sector=_SECTORS[h(i + j, "sector") % len(_SECTORS)],
                    yy=20 + h(i + j, "yy") % 6,
                    cve=1000 + h(i + j, "cve") % 9000,
                    a=h(i + j, "a") % 250 + 1,
                    b=h(i + j, "b") % 250 + 1,
                    c=h(i + j, "c") % 250 + 1,
                    m=1 + h(i + j, "m") % 20,
                    hash=hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest(),
                )
            )
        return " ".join(parts)

    rows = []
    for i in range(n_docs):
        # heavy-tail domain pick: u² concentration → P(domain d) ≈
        # 1/(2·sqrt(d·N)), head domain ~14x the tail
        u = (h(i, "dom") % 1_000_000) / 1_000_000
        if hot_frac is None:
            domain = int(N_DOMAINS * u * u)
        elif u < hot_frac:
            domain = 0
        else:
            domain = 1 + int((N_DOMAINS - 1) * (u - hot_frac) / (1 - hot_frac))
        dup = (h(i, "dup") % 1_000_000) < frac_dup_url * 1_000_000
        url_i = i - 1 if dup and i else i
        url = f"https://feeds{domain}.example.com/report/{url_i}"
        null_text = (h(i, "null") % 1_000_000) < frac_null_text * 1_000_000
        non_en = (h(i, "lang") % 1_000_000) < frac_non_english * 1_000_000
        text = None if null_text else mk_text(i)
        html = (
            f'<html><script type="application/ld+json">{{"articleBody": "{mk_text(i)}"}}</script></html>'.encode()
            if null_text
            else None
        )
        rows.append((url, f"2026-0{1 + i % 9}-0{1 + i % 9}", html, text, "fr" if non_en else "en"))

    df = spark.createDataFrame(
        rows, "url string, warc_ts_s string, html binary, text string, lang string"
    )
    return df.select(
        "url",
        F.col("warc_ts_s").cast("timestamp").alias("warc_ts"),
        "html",
        "text",
        "lang",
    )
