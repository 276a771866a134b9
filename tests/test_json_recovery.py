"""Tests for the JSON recovery parser (O-6 parity) and line-format triple
parsing (O-9).  Pure-Python — no Spark session needed."""

from __future__ import annotations

from kgspark.kernels.json_recovery import extract_json_from_text, parse_line_triples

TRIPLES = [{"subject": "a", "predicate": "p", "object": "b"}]


def test_direct_parse():
    assert extract_json_from_text('[{"subject":"a","predicate":"p","object":"b"}]') == TRIPLES


def test_fenced():
    txt = 'Here you go:\n```json\n[{"subject":"a","predicate":"p","object":"b"}]\n```\nthanks'
    assert extract_json_from_text(txt) == TRIPLES


def test_array_embedded_in_prose():
    txt = 'The result is [{"subject":"a","predicate":"p","object":"b"}] as requested.'
    assert extract_json_from_text(txt) == TRIPLES


def test_unquoted_keys_and_trailing_comma():
    txt = '[{subject: "a", predicate: "p", object: "b",},]'
    assert extract_json_from_text(txt) == TRIPLES


def test_truncated_array_salvage():
    txt = ('[{"subject":"a","predicate":"p","object":"b"},'
           '{"subject":"x","predicate":"q","object"')
    assert extract_json_from_text(txt) == TRIPLES


def test_string_aware_brackets():
    txt = '[{"subject":"a [weird]","predicate":"p","object":"b"}]'
    got = extract_json_from_text(txt)
    assert got[0]["subject"] == "a [weird]"


def test_single_object_wrapped():
    assert extract_json_from_text('{"subject":"a","predicate":"p","object":"b"}') == TRIPLES


def test_hopeless_returns_none():
    assert extract_json_from_text("no json here at all") is None
    assert extract_json_from_text("") is None


def test_line_triples():
    txt = "alpha - loves - beta\nmalformed line\nx - is - y\n a - b "
    assert parse_line_triples(txt) == [
        {"subject": "alpha", "predicate": "loves", "object": "beta"},
        {"subject": "x", "predicate": "is", "object": "y"},
    ]
