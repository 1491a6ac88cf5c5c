"""IOC (indicator-of-compromise) detection.

Semantics match the reference pattern bank and prefilter
(ctinexus/cti_processor.py:10-48): 16 compiled Python-`re` patterns,
a cheap indicator prefilter, and "union of the first match per
pattern per mention". Kept in Python `re` (inside pandas UDFs) rather
than Spark `rlike` so \\b and unicode behave identically to CPython.
"""

from __future__ import annotations

import re

MONTHS = (
    "January|February|March|April|May|June|July|August|September"
    "|October|November|December"
)

IOC_PATTERNS: dict[str, re.Pattern] = {
    "date": re.compile(rf"\b(?:{MONTHS})\s\d{{4}}\b"),
    "ip": re.compile(r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    "domain": re.compile(r"\b(?:[a-zA-Z0-9-]+\.)+[a-zA-Z]{2,6}\b"),
    "url": re.compile(r"\b(?:https?://|www\.)[a-zA-Z0-9-]+\.[a-zA-Z]{2,6}\S*\b"),
    "email": re.compile(r"\b[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,6}\b"),
    "hash_md5": re.compile(r"\b[a-fA-F0-9]{32}\b"),
    "hash_sha1": re.compile(r"\b[a-fA-F0-9]{40}\b"),
    "hash_sha256": re.compile(r"\b[a-fA-F0-9]{64}\b"),
    "hash_sha512": re.compile(r"\b[a-fA-F0-9]{128}\b"),
    "cve": re.compile(r"\bCVE-\d{4}-\d{4,7}\b"),
    "cvss": re.compile(r"\bCVSS\d\.\d\b"),
    "yara": re.compile(r"\bYARA\d{4}\b"),
    "money": re.compile(r"[€£\$]\d+(?:\.\d+)?\s(?:million|billion)\b"),
    "os": re.compile(
        r"\b(?:Windows|Linux|MacOS|Android|iOS|Unix)\soperating\s(?:system|systems)\b"
    ),
    "sector": re.compile(r"\b[A-Za-z]+(?:\s[A-Za-z]+)*\ssector\b"),
    "version": re.compile(r"\b(?:v|version)\s\d+(?:\.\d+){1,3}\b"),
}

# Prefilter: any digit/symbol typical of indicators, or an IOC keyword.
_PREFILTER_RE = re.compile(
    r"[0-9@:/\-\.]"
    r"|(?:CVE|CVSS|YARA|Windows|Linux|MacOS|Android|iOS|Unix|sector|million|billion)"
)


def detect_iocs(mention_merged: list[str], mention_text: str) -> set[str]:
    """Set of IOC substrings found across a cluster's mention texts.

    One (first) match per pattern per mention, prefiltered to skip
    mentions that cannot possibly contain an indicator.
    """
    found: set[str] = set()
    for mention in [*mention_merged, mention_text]:
        if not _PREFILTER_RE.search(mention):
            continue
        for rx in IOC_PATTERNS.values():
            m = rx.search(mention)
            if m:
                found.add(m.group())
    return found


def classify_ioc(text: str) -> str | None:
    """First pattern (bank order) whose match covers the text; used by
    the deterministic stub entity-typer."""
    for name, rx in IOC_PATTERNS.items():
        if rx.search(text):
            return name
    return None
