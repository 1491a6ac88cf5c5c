"""Unit tests for the text-normalization invariants.

Vectors are hand-derived from the reference contract
(llm_processor.py:828-863 normalize_text, :419-456 merge,
:458-519 signal lines, :723-771 focus text) — each rule has a case.
"""

from hypothesis import given
from hypothesis import strategies as st

from ctinexus_spark.text import (
    build_cti_focus_text,
    extract_jsonld,
    extract_meta_description,
    is_cti_signal_line,
    is_well_formed_cti_paragraph,
    merge_extraction_candidates,
    normalize_text,
)


class TestNormalizeText:
    def test_non_string_returns_empty(self):
        assert normalize_text(None) == ""
        assert normalize_text(42) == ""

    def test_crlf_and_whitespace_collapse(self):
        assert normalize_text("a  b\r\nc\rd") == "a b\nc\nd"

    def test_html_unescape(self):
        assert normalize_text("Tom &amp; Jerry") == "Tom & Jerry"

    def test_zero_width_stripped(self):
        assert normalize_text("a​b﻿c⁠d") == "abcd"

    def test_boilerplate_lines_dropped(self):
        raw = "Real content line\nCookies are used here\nPrivacy Policy\nSubscribe now\nSign up today\nAdvertisement\nAll rights reserved 2024\nAnother real line"
        assert normalize_text(raw) == "Real content line\nAnother real line"

    def test_boilerplate_match_is_line_start_only(self):
        # 'subscribe' mid-line is kept; only line-start matches drop.
        assert normalize_text("Attackers subscribe to feeds") == "Attackers subscribe to feeds"

    def test_case_insensitive_line_dedup_keeps_first(self):
        raw = "Alpha Line\nalpha line\nALPHA LINE\nBeta"
        assert normalize_text(raw) == "Alpha Line\nBeta"

    def test_empty_lines_removed(self):
        assert normalize_text("a\n\n\n\nb") == "a\nb"

    def test_terms_of_use_variants(self):
        assert normalize_text("Terms of use apply\nTerms and conditions\nterms xyz") == "terms xyz"

    def test_accept_cookies_variants(self):
        assert (
            normalize_text("Accept all cookies\nAccept cookies\nAccepted practice")
            == "Accepted practice"
        )

    @given(st.text(max_size=500))
    def test_idempotent(self, s):
        once = normalize_text(s)
        assert normalize_text(once) == once

    @given(st.text(max_size=500))
    def test_output_shape(self, s):
        out = normalize_text(s)
        for line in out.splitlines():
            assert line == line.strip()
            assert "  " not in line


class TestSignalLine:
    def test_drop_patterns(self):
        for line in ("Figure 3: diagram", "Source: vendor blog", "Recommendations",
                     "subscribe to our newsletter", "Read more about this"):
            assert not is_cti_signal_line(line)

    def test_strong_terms(self):
        assert is_cti_signal_line("The ransomware spread fast")
        assert is_cti_signal_line("CVE-2024-1234 was exploited")
        assert is_cti_signal_line("uses Cobalt Strike beacons")

    def test_long_sentence_kept(self):
        line = "x" * 89 + " tail of a long descriptive narrative sentence."
        assert is_cti_signal_line(line)

    def test_short_neutral_dropped(self):
        assert not is_cti_signal_line("A short neutral line.")


class TestMergeCandidates:
    def _c(self, source, text):
        return {"source": source, "text": text, "length": len(text)}

    def test_empty(self):
        assert merge_extraction_candidates([]) == ""

    def test_priority_order(self):
        got = merge_extraction_candidates(
            [self._c("meta_description", "meta text"), self._c("trafilatura_json", "main body")]
        )
        assert got.startswith("main body")

    def test_extra_lines_need_signal(self):
        got = merge_extraction_candidates(
            [
                self._c("trafilatura_json", "base line"),
                self._c("jsonld", "boring extra\nransomware detail extra"),
            ]
        )
        assert got == "base line\nransomware detail extra"

    def test_case_insensitive_dedup(self):
        got = merge_extraction_candidates(
            [self._c("trafilatura_json", "The Ransomware"), self._c("jsonld", "the ransomware")]
        )
        assert got == "The Ransomware"

    def test_char_cap_word_boundary(self):
        body = " ".join(["ransomware"] * 2000)
        got = merge_extraction_candidates([self._c("trafilatura_json", body)], max_chars=100)
        assert len(got) <= 100
        assert not got.endswith(" ")
        assert got == body[:100].rsplit(" ", 1)[0].strip()

    def test_unknown_source_ranks_last_longer_first_within_tie(self):
        got = merge_extraction_candidates(
            [self._c("mystery", "short"), self._c("mystery", "a ransomware line that is longer")]
        )
        assert got.startswith("a ransomware line that is longer")


class TestFocusText:
    def test_skip_section_until_resume(self):
        text = "Intro line\nRecommendations\nbuy our product\nmore marketing\nInitial Access details\ntechnical fact"
        got = build_cti_focus_text(text)
        assert got == "Intro line\nInitial Access details\ntechnical fact"

    def test_drop_lines(self):
        text = "keep\nFigure 12 something\nSource: blog\nRelated posts\nkeep2"
        assert build_cti_focus_text(text) == "keep\nkeep2"

    def test_cap(self):
        text = "\n".join(["word line here"] * 2000)
        got = build_cti_focus_text(text, max_chars=50)
        assert len(got) <= 50


class TestParagraphShape:
    def test_well_formed(self):
        p = ("The Akira ransomware group compromised the network. "
             "They used stolen credentials for initial access. "
             "Data was exfiltrated before encryption began. "
             "The actor demanded payment in cryptocurrency.")
        assert is_well_formed_cti_paragraph(p)

    def test_too_short(self):
        assert not is_well_formed_cti_paragraph("Short. Text. Here.")

    def test_bullets_rejected(self):
        p = "A long enough start of paragraph text here. " * 3 + "\n- bullet item"
        assert not is_well_formed_cti_paragraph(p)

    def test_preface_rejected(self):
        p = "Here is a summary of the report. " * 5
        assert not is_well_formed_cti_paragraph(p)


class TestHtmlFallbacks:
    def test_jsonld_extraction(self):
        html = (
            '<html><script type="application/ld+json">'
            '{"@graph": [{"articleBody": "Malware analysis body.", '
            '"headline": "Title X", "datePublished": "2024-01-01", '
            '"author": {"name": "Ann Alyst"}}]}'
            "</script></html>"
        )
        got = extract_jsonld(html)
        assert got["text"] == "Malware analysis body."
        assert got["title"] == "Title X"
        assert got["author"] == "Ann Alyst"

    def test_jsonld_control_char_recovery(self):
        html = ('<script type="application/ld+json">{"articleBody": "ok\x01body"}</script>')
        assert extract_jsonld(html)["text"] == "okbody"

    def test_meta_description(self):
        html = '<meta name="description" content="A threat &amp; report">'
        assert extract_meta_description(html)["text"] == "A threat & report"

    def test_og_description_fallback(self):
        html = '<meta property="og:description" content="og text">'
        assert extract_meta_description(html)["text"] == "og text"
