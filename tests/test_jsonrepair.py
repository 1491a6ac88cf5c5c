"""JSON-repair cascade tests (reference behavior:
llm_processor.py:1389-1441; test seeds from FIXTURES.md §6)."""

import pytest
from hypothesis import given
from hypothesis import strategies as st

from ctinexus_spark.jsonrepair import parse_llm_json


@given(st.text(max_size=300))
def test_arbitrary_text_never_crashes_unexpectedly(s):
    """Model output is arbitrary: the only permitted failure is
    ValueError (the reference's contract)."""
    try:
        parse_llm_json(s)
    except ValueError:
        pass


def test_clean_json():
    assert parse_llm_json('{"triplets": []}') == {"triplets": []}


def test_fenced_json():
    txt = 'Sure! Here you go:\n```json\n{"triplets": [{"subject": "a", "relation": "r", "object": "b"}]}\n```'
    got = parse_llm_json(txt)
    assert got["triplets"][0]["subject"] == "a"


def test_single_quotes_fixed():
    got = parse_llm_json("{'key': 'value'}")
    assert got == {"key": "value"}


def test_trailing_comma_fixed():
    got = parse_llm_json('{"a": [1, 2,], "b": 3,}')
    assert got == {"a": [1, 2], "b": 3}


def test_unquoted_keys_fixed():
    got = parse_llm_json("{subject: 'x', relation: 'y', object: 'z'}")
    assert got == {"subject": "x", "relation": "y", "object": "z"}


def test_bare_triplet_fallback_single_quote():
    txt = "output: {'subject': 'APT1', 'relation': 'uses', 'object': 'Tool'} {'subject': 'b', 'relation': 'c', 'object': 'd'}"
    # Greedy {...} span fails to parse → triplet regex fallback collects both.
    got = parse_llm_json(txt)
    assert got == {
        "triplets": [
            {"subject": "APT1", "relation": "uses", "object": "Tool"},
            {"subject": "b", "relation": "c", "object": "d"},
        ]
    }


def test_unparseable_raises():
    with pytest.raises(ValueError):
        parse_llm_json("no json here at all")


def test_dict_passthrough():
    assert parse_llm_json({"a": 1}) == {"a": 1}


def test_newlines_inside_json():
    txt = 'prefix {"triplets":\n [{"subject": "s",\n "relation": "r", "object": "o"}]} suffix'
    got = parse_llm_json(txt)
    assert got["triplets"][0]["object"] == "o"
