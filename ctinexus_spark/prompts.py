"""Prompt construction for the three LLM stages.

The reference renders Jinja2 templates from its prompts/ directory
(ie.jinja via llm_processor.py:1142-1175; et.jinja via :200-213;
link.jinja via :998-1015). This module carries equivalent templates
inline (jinja2 ships in executors via --py-files; templates written
fresh for this engine — same variables, same contract: JSON-object
output, the 16-class CTI taxonomy, demos + query for IE, all triples
of a doc for ET, main/topic/CTI text for LP).

A production ModelClient composes these into its completion calls;
the deterministic StubModel ignores them, so prompt text never
affects oracle-checked results.
"""

from __future__ import annotations

from jinja2 import Template

# ET taxonomy (reference prompts/et.jinja:2-37).
ENTITY_CLASSES = [
    "Account", "Credential", "Tool", "Attacker", "Event",
    "Exploit Target", "Indicator: File", "Indicator: IP",
    "Indicator: URL", "Indicator: Domain", "Indicator: Registry Key",
    "Indicator: Hash", "Indicator: Mutex", "Indicator: User Agent",
    "Indicator: Email", "Indicator: Yara Rule",
    "Indicator: SSL Certificate", "Information", "Location", "Malware",
    "Malware Characteristic: Behavior", "Malware Characteristic: Capability",
    "Malware Characteristic: Feature", "Malware Characteristic: Payload",
    "Malware Characteristic: Variants", "Organization", "Infrastructure",
    "Time", "Vulnerability",
]

IE_TEMPLATE = Template(
    """You extract cybersecurity knowledge triples from threat reports.
Given a report, emit a JSON object {"triplets": [{"subject": ..., "relation": ..., "object": ...}]}.
Subjects and objects are entity mentions from the text; annotate each with its entity class in parentheses when confident. Classes: {{ classes | join(', ') }}.
{% for demo_text, demo_triplets in demos %}
Example report:
{{ demo_text }}
Example output:
{"triplets": {{ demo_triplets | tojson }}}
{% endfor %}
Report:
{{ query }}
Output JSON only."""
)

ET_TEMPLATE = Template(
    """You classify cybersecurity entities. For each triple below, assign the subject and object one class from: {{ classes | join(', ') }}.
Return JSON {"tagged_triples": [{"subject": {"text": ..., "class": ...}, "relation": ..., "object": {"text": ..., "class": ...}}]}.
Triples:
{{ triples | tojson }}
Output JSON only."""
)

LINK_TEMPLATE = Template(
    """Read the threat report and predict the missing relationship between two entities.
Report:
{{ cti }}
Entity A: {{ main_node }}
Entity B: {{ topic_node }}
Return JSON {"predicted_triple": {"subject": ..., "relation": ..., "object": ...}} using exactly the two entity strings as subject and object.
Output JSON only."""
)


def build_ie_prompt(query: str, demos: list[tuple[str, list]] | None = None) -> list[dict]:
    content = IE_TEMPLATE.render(query=query, demos=demos or [], classes=ENTITY_CLASSES)
    return [{"role": "user", "content": content}]


def build_et_prompt(triples: list[dict]) -> list[dict]:
    content = ET_TEMPLATE.render(triples=triples, classes=ENTITY_CLASSES)
    return [{"role": "user", "content": content}]


def build_link_prompt(cti_text: str, main_node: str, topic_node: str) -> list[dict]:
    content = LINK_TEMPLATE.render(cti=cti_text, main_node=main_node, topic_node=topic_node)
    return [{"role": "user", "content": content}]
