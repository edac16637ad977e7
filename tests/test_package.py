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
