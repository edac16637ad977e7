"""spark-submit packaging seam (north_rule: "run via spark-submit
--py-files"): the zip that tools/package.py builds must be a complete,
importable distribution of the engine — the exact artifact an executor
materializes on local disk from ``--py-files``.
"""

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import package  # tools/package.py  # noqa: E402


def test_zip_contains_full_package(tmp_path):
    zpath, script = package.build(str(tmp_path))
    names = set(zipfile.ZipFile(zpath).namelist())
    for required in [
        "ocr_platform_spark/__init__.py",
        "ocr_platform_spark/cli.py",
        "ocr_platform_spark/kernels.py",
        "ocr_platform_spark/operators/extract.py",
        "ocr_platform_spark/operators/upsert.py",
        "ocr_platform_spark/functions/dedup.py",
        "ocr_platform_spark/lineage.py",
    ]:
        assert required in names, required
    assert not any("__pycache__" in n for n in names)
    assert os.path.exists(script)


def test_package_imports_from_zip_only(tmp_path):
    """Import the engine from the zip in a clean subprocess with the repo
    NOT on sys.path — what a bare executor sees after --py-files ships the
    archive. The kernel 'weights' (glyph tables) must come up too."""
    zpath, _ = package.build(str(tmp_path))
    code = (
        "import sys, os\n"
        f"sys.path.insert(0, {zpath!r})\n"
        "import ocr_platform_spark\n"
        "from ocr_platform_spark import kernels, formats, oracle\n"
        "from ocr_platform_spark.operators import extract\n"
        "from ocr_platform_spark.cli import main\n"
        f"assert ocr_platform_spark.__file__.startswith({zpath!r}), "
        "ocr_platform_spark.__file__\n"
        # the glyph 'weights' work when loaded from the zip
        "row = kernels.glyph_row('hello')\n"
        "text, ok = kernels.decode_row(row)\n"
        "assert text == 'hello' and ok, (text, ok)\n"
        "print('ZIP-IMPORT-OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ZIP-IMPORT-OK" in out.stdout


def test_cli_rejects_missing_args(tmp_path):
    """The job script's arg contract fails fast (argparse exit 2), before
    any Spark session is built."""
    zpath, script = package.build(str(tmp_path))
    out = subprocess.run(
        [sys.executable, script],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": zpath},
    )
    assert out.returncode == 2
    assert "--documents" in out.stderr


def _spark_submit_bin():
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return p if os.path.exists(p) else None


import pytest  # noqa: E402


@pytest.mark.skipif(_spark_submit_bin() is None, reason="no spark-submit")
def test_spark_submit_py_files_end_to_end(tmp_path, spark):
    """LIVE north-rule deployment shape: `spark-submit --py-files
    <zip> run_extract.py ...` in a clean subprocess (PYTHONPATH unset —
    the zip is the only source of the engine), then the landed output is
    verified span-for-span against the single-node oracle."""
    from ocr_platform_spark import corpus, oracle

    corpus_dir = str(tmp_path / "corpus")
    corpus.write_parquet(corpus_dir, 24, max_pages=4, n_files=2)
    zpath, script = package.build(str(tmp_path / "dist"))
    out_dir = str(tmp_path / "out")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    res = subprocess.run(
        [
            _spark_submit_bin(), "--master", "local[4]",
            "--py-files", zpath, script,
            "--documents", f"{corpus_dir}/documents.parquet",
            "--media", f"{corpus_dir}/media.parquet",
            "--out", out_dir, "--run-id", "submit-smoke",
            "--buckets", "4", "--chunk-buckets", "2",
        ],
        capture_output=True, text=True, env=env, timeout=420,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "chunks executed: 2" in res.stdout

    docs, media = corpus.generate(24, max_pages=4)
    mb = {k: v["data"] for k, v in media.items()}
    want = {
        d["doc_id"]: [
            (s.kind, s.text, s.media_ref, s.order)
            for s in oracle.extract_document(d["spans"], mb)
        ]
        for d in docs
    }
    rows = spark.read.parquet(f"{out_dir}/data").collect()
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for r in rows
    }
    assert got == want
