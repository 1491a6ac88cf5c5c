"""LLM-response JSON repair cascade.

Reproduces the reference's tolerant parse order
(ctinexus/llm_processor.py:1389-1441): strict parse → greedy {...}
span (newlines flattened) → single-quote fix → trailing-comma fix →
unquoted-key fix → bare triplet-pattern fallback → ValueError.
Runs inside pandas UDFs; never replaced with Spark `from_json`, which
has no repair semantics.
"""

from __future__ import annotations

import json
import re

_BRACE_SPAN_RE = re.compile(r"\{[\s\S]*\}")
_TRAILING_COMMA_RE = re.compile(r",(\s*[}\]])")
_BARE_KEY_RE = re.compile(r"([{,]\s*)(\w+)(\s*):")

_TRIPLET_FALLBACK_RES = [
    re.compile(p)
    for p in (
        r"\{'subject':\s*'([^']*)',\s*'relation':\s*'([^']*)',\s*'object':\s*'([^']*)'\}",
        r'\{"subject":\s*"([^"]*)",\s*"relation":\s*"([^"]*)",\s*"object":\s*"([^"]*)"\}',
        r"'subject':\s*'([^']*)',\s*'relation':\s*'([^']*)',\s*'object':\s*'([^']*)'",
        r'"subject":\s*"([^"]*)",\s*"relation":\s*"([^"]*)",\s*"object":\s*"([^"]*)"',
    )
]


def parse_llm_json(response_text):
    """Best-effort JSON extraction from a model response string."""
    if not isinstance(response_text, str):
        return dict(response_text)

    cleaned = response_text.strip()
    try:
        return json.loads(cleaned)
    except (json.JSONDecodeError, TypeError):
        pass

    span = _BRACE_SPAN_RE.search(cleaned.replace("\n", " "))
    if span:
        candidate = span.group()
        try:
            try:
                return json.loads(candidate)
            except json.JSONDecodeError:
                requoted = candidate.replace("'", '"')
                try:
                    return json.loads(requoted)
                except json.JSONDecodeError:
                    fixed = _TRAILING_COMMA_RE.sub(r"\1", requoted)
                    fixed = _BARE_KEY_RE.sub(r'\1"\2"\3:', fixed)
                    return json.loads(fixed)
        except Exception:
            pass

    for rx in _TRIPLET_FALLBACK_RES:
        hits = rx.findall(cleaned)
        if hits:
            return {
                "triplets": [
                    {"subject": s.strip(), "relation": r.strip(), "object": o.strip()}
                    for s, r, o in hits
                ]
            }

    raise ValueError("Failed to extract JSON from response text")
