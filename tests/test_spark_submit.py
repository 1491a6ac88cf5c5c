"""The north_rule ship-shape: the job runs via REAL spark-submit with
--py-files (fresh JVM + executors importing the package from the zip,
no repo on sys.path), end to end from parquet in to parquet out."""

import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this box")
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    # package the library exactly as a cluster deploy would
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "package_pyfiles.py")],
        capture_output=True, text=True, check=True, cwd=REPO,
    ).stdout.strip()
    assert zip_path.endswith(".zip") and os.path.exists(zip_path)

    inp = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "kg")
    duckdb.sql(f"""
        COPY (SELECT 'https://d' || CAST(doc_id AS VARCHAR) || '.example.com/' || CAST(doc_id AS VARCHAR) AS url,
                     TIMESTAMP '2026-01-01 00:00:00' AS warc_ts,
                     CAST(NULL AS BLOB) AS html,
                     'The actor exploited CVE-2024-' || CAST(1000 + doc_id AS VARCHAR) ||
                     ' and beaconed to 10.0.' || CAST(doc_id % 250 AS VARCHAR) || '.1 from evil' ||
                     CAST(doc_id AS VARCHAR) || '.example-c2.com on 2024-01-0' ||
                     CAST(1 + doc_id % 9 AS VARCHAR) AS text,
                     lang
              FROM read_parquet('/root/testdata/sf0.001/documents.parquet') LIMIT 40)
        TO '{inp}' (FORMAT PARQUET)
    """)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    run = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
         os.path.join(REPO, "jobs", "run_kg.py"),
         "--input", inp, "--output", out, "--lang", "en"],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path),
    )
    assert run.returncode == 0, run.stderr[-2000:]
    assert "KG rows written:" in run.stdout

    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{out}/*.parquet')").fetchone()[0]
    assert n > 0
    cols = {r[0] for r in duckdb.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{out}/*.parquet')").fetchall()}
    assert {"url", "subj", "pred", "obj", "source"} <= cols


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this box")
def test_spark_submit_dedup_keeplist(tmp_path):
    """The second flagship ships the same way: the dedup keep-list
    funnel via real spark-submit --py-files, parquet in → parquet out;
    exact duplicates collapse to one survivor."""
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "package_pyfiles.py")],
        capture_output=True, text=True, check=True, cwd=REPO,
    ).stdout.strip()

    inp = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "keep")
    duckdb.sql(f"""
        COPY (SELECT doc_id, text FROM (
                SELECT doc_id, text FROM read_parquet('/root/testdata/sf0.001/documents.parquet') LIMIT 30
              )
              UNION ALL
              SELECT doc_id + 1000 AS doc_id, text FROM (
                SELECT doc_id, text FROM read_parquet('/root/testdata/sf0.001/documents.parquet') LIMIT 10
              ))
        TO '{inp}' (FORMAT PARQUET)
    """)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    run = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
         os.path.join(REPO, "jobs", "run_dedup.py"),
         "--input", inp, "--output", out],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path),
    )
    assert run.returncode == 0, run.stderr[-2000:]
    assert "keeplist rows written:" in run.stdout
    # 40 in, 10 exact duplicate pairs → every +1000 copy drops (its
    # original has the smaller id); the corpus may also carry natural
    # FUZZY near-dup pairs among the originals, so survivors are <= 30
    kept = {r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{out}/*.parquet')").fetchall()}
    assert 25 <= len(kept) <= 30, kept
    assert all(k < 1000 for k in kept)
