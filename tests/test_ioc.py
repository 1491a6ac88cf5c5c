"""IOC pattern-bank tests — mirror of the reference's parametrized
cases (tests/unit/test_cti_processor.py:12-63), hand-reconstructed."""

import pytest

from ctinexus_spark.ioc import IOC_PATTERNS, classify_ioc, detect_iocs


@pytest.mark.parametrize(
    "text,pattern,expected",
    [
        ("attack in January 2023 happened", "date", "January 2023"),
        ("beacon to 192.168.1.100 daily", "ip", "192.168.1.100"),
        ("resolved malicious.example.com today", "domain", "malicious.example.com"),
        ("fetch http://malicious.com/payload now", "url", "http://malicious.com/payload"),
        ("mailto attacker@malicious.com sent", "email", "attacker@malicious.com"),
        ("md5 " + "a1" * 16, "hash_md5", "a1" * 16),
        ("sha1 " + "b2" * 20, "hash_sha1", "b2" * 20),
        ("sha256 " + "c3" * 32, "hash_sha256", "c3" * 32),
        ("sha512 " + "d4" * 64, "hash_sha512", "d4" * 64),
        ("exploits CVE-2023-1234 widely", "cve", "CVE-2023-1234"),
        ("scored CVSS9.8 critical", "cvss", "CVSS9.8"),
        ("rule YARA2024 matched", "yara", "YARA2024"),
        ("ransom of $5 million paid", "money", "$5 million"),
        ("targets Windows operating system hosts", "os", "Windows operating system"),
        # Note: the sector pattern is greedy leftward across words —
        # 'hits the financial sector' would match in full (reference
        # cti_processor.py:27 behaves identically).
        ("financial sector organizations", "sector", "financial sector"),
        ("runs version 1.2.3 still", "version", "version 1.2.3"),
    ],
)
def test_each_pattern_matches(text, pattern, expected):
    m = IOC_PATTERNS[pattern].search(text)
    assert m is not None and m.group() == expected


def test_detect_collects_across_mentions():
    got = detect_iocs(["192.168.1.100", "CVE-2023-1234"], "evil.example.com")
    assert {"192.168.1.100", "CVE-2023-1234", "evil.example.com"} <= got


def test_detect_prefilter_skips_plain_words():
    assert detect_iocs(["plain words only"], "another plain mention") == set()


def test_detect_empty_on_non_ioc():
    assert detect_iocs([], "Lazarus Group") == set()


def test_classify_ioc():
    assert classify_ioc("CVE-2021-44228") == "cve"
    assert classify_ioc("10.0.0.1") == "ip"
    assert classify_ioc("no indicators") is None
