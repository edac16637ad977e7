import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from ocr_platform_spark.session import get_spark

    s = get_spark("ocr-platform-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tifftool(tmp_path_factory):
    """Compile tools/TiffTool.java once per session; yields a runner.

    Java ImageIO's TIFF plugin is the external ground truth for the
    stdlib codecs (LZW/PackBits/Deflate/CCITT): it encodes fixtures our
    decoders must match bit-exactly and decodes our encoders' output."""
    import shutil
    import subprocess

    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("JDK not available")
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "TiffTool.java")
    cp = tmp_path_factory.mktemp("tifftool")
    subprocess.run(["javac", "-d", str(cp), src], check=True)

    def run(*args):
        subprocess.run(["java", "-cp", str(cp), "TiffTool",
                        *map(str, args)], check=True)

    return run


@pytest.fixture(scope="session")
def cryptotool(tmp_path_factory):
    """Compile tools/CryptoTool.java once per session; yields a runner
    that returns the JCE cipher output as a lowercase hex string — the
    external ground truth for ocr_platform_spark.crypto."""
    import shutil
    import subprocess

    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("JDK not available")
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "CryptoTool.java")
    cp = tmp_path_factory.mktemp("cryptotool")
    subprocess.run(["javac", "-d", str(cp), src], check=True)

    def run(*args) -> str:
        out = subprocess.run(["java", "-cp", str(cp), "CryptoTool",
                              *map(str, args)], check=True,
                             capture_output=True, text=True)
        return out.stdout.strip()

    return run


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Small deterministic corpus shared by Spark-level tests."""
    from ocr_platform_spark import corpus

    d = tmp_path_factory.mktemp("corpus")
    corpus.write_parquet(str(d), n_docs=60, seed=42, max_pages=30)
    return str(d)
