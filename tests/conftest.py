import os
import sys

import pytest

from ctinexus_spark.session import build_session

# Local-mode Python workers must be able to unpickle classes defined in
# test modules (e.g. stub-model subclasses) — extend PYTHONPATH before
# the JVM starts.
_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_DIR = os.path.dirname(_TESTS_DIR)
os.environ["PYTHONPATH"] = os.pathsep.join(
    [p for p in (_TESTS_DIR, _REPO_DIR, os.environ.get("PYTHONPATH", "")) if p]
)
if _TESTS_DIR not in sys.path:
    sys.path.insert(0, _TESTS_DIR)


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="ctinexus-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


CTI_DOC_1 = (
    "Akira ransomware operators exploited CVE-2023-1234 on exposed VPN appliances. "
    "The actor beaconed to 192.168.1.100 and staged payloads on evil-domain.example.com.\n"
    "A second wave used credential theft."
)

CTI_DOC_2 = (
    "LockBit affiliates used phishing emails from attacker@malicious.com.\n"
    "Victims in the financial sector paid $5 million in January 2024."
)


@pytest.fixture
def cti_documents(spark):
    rows = [
        ("https://threats.example.com/akira", CTI_DOC_1, "en"),
        ("https://blog.example.org/lockbit", CTI_DOC_2, "en"),
        ("https://ignore.example.net/fr", "contenu français CVE-2020-0001", "fr"),
    ]
    return spark.createDataFrame(rows, "url string, text string, lang string")
