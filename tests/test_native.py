"""Native-code sanitizer tests: build the Delaunay core with ASan/UBSan and
run its standalone invariant checker (the sanitizer coverage the reference
lacks — SURVEY.md section 5)."""

import os
import subprocess

import pytest

NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "flame_tpu", "native")


@pytest.mark.parametrize("flags,name", [
    (["-O2"], "plain"),
    (["-O1", "-g", "-fsanitize=address,undefined",
      "-fno-sanitize-recover=all"], "asan_ubsan"),
])
def test_native_invariants(tmp_path, flags, name):
    binary = os.path.join(tmp_path, f"delaunay_test_{name}")
    build = subprocess.run(
        ["g++", "-std=c++17", *flags,
         os.path.join(NATIVE, "delaunay.cpp"),
         os.path.join(NATIVE, "delaunay_test.cpp"),
         "-o", binary],
        capture_output=True, text=True, timeout=180)
    assert build.returncode == 0, build.stderr
    run = subprocess.run([binary], capture_output=True, text=True,
                         timeout=120)
    assert run.returncode == 0, run.stdout + run.stderr
    assert "ALL OK" in run.stdout
