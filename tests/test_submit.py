"""North-rule deployment gate: the engine runs via spark-submit --py-files
with imposm2_spark imported ONLY from the packaged zip (self-contained), and
the web-table source resolves catalog/iceberg/parquet references."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.spark


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_pyfiles(tmp_path):
    zip_path = str(tmp_path / "imposm2_spark.zip")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "build_pyfiles.py"), zip_path],
        capture_output=True, text=True, check=True,
    )
    assert out.stdout.strip() == zip_path
    # cwd OUTSIDE the repo: the package must come from --py-files alone
    run = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]", "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_spine.py"),
         "/root/testdata/sf0.001/documents.parquet"],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=300,
    )
    assert run.returncode == 0, run.stderr[-2000:]
    result = json.loads(run.stdout.strip().splitlines()[-1])
    assert result["n_tiles"] == 168  # deterministic sf0.001 spine output


def test_read_web_pages_parquet_and_validation(spark, tmp_path):
    from imposm2_spark.sources import testdata
    from imposm2_spark.sources.webtable import read_web_pages, validate_web_schema

    docs = testdata.load(spark, "/root/testdata/sf0.001", "documents")
    web = testdata.synth_documents_web(docs)
    path = str(tmp_path / "web.parquet")
    web.write.parquet(path)
    back = read_web_pages(spark, path)
    assert set(back.columns) == {"url", "warc_ts", "html", "text", "lang"}
    assert back.count() == docs.count()
    with pytest.raises(ValueError, match="missing columns"):
        validate_web_schema(docs)


def test_read_web_pages_refuses_damaged_iceberg_table(spark, tmp_path):
    """ADVICE r3: a real Iceberg table whose metadata/ dir is corrupted raises
    the same NoSuchTable-shaped error as a plain parquet dir. The fallback
    must probe for metadata/ and refuse to serve raw data files (stale rows)
    — and still fall back happily for a genuine parquet dir (no metadata/)."""
    import os

    from imposm2_spark.sources import testdata
    from imposm2_spark.sources.webtable import read_web_pages

    docs = testdata.load(spark, "/root/testdata/sf0.001", "documents")
    web = testdata.synth_documents_web(docs)
    path = str(tmp_path / "iceberg_table")
    web.write.parquet(path)
    os.makedirs(os.path.join(path, "metadata"))  # the Iceberg fingerprint
    with pytest.raises(RuntimeError, match="metadata"):
        read_web_pages(spark, path)

    plain = str(tmp_path / "plain.parquet")
    web.write.parquet(plain)
    with pytest.warns(UserWarning, match="retrying as plain"):
        assert read_web_pages(spark, plain).count() == docs.count()
