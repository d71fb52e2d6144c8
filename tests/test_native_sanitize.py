"""Sanitizer posture for the native C++ runtime (SURVEY §5.2): the
suite itself runs the ASan+UBSan smoke tests and the TSan concurrency
test, so a sanitizer regression fails CI — coverage the reference
never had (its known benign-by-luck races: demo.c:33-55 globals,
darknet.c:358 GlobleObjBoxes)."""

import pathlib
import shutil
import subprocess

import pytest

NATIVE = pathlib.Path(__file__).resolve().parent.parent / "native"


def _make(target: str):
    if shutil.which("g++") is None or shutil.which("make") is None:
        pytest.skip("no native toolchain")
    r = subprocess.run(["make", "-C", str(NATIVE), target],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (
        f"make {target} failed:\n{r.stdout}\n{r.stderr}")
    return r.stdout + r.stderr


def test_asan_ubsan_clean():
    out = _make("check")
    assert "native tests OK" in out
    assert "runtime error" not in out          # UBSan report marker
    assert "AddressSanitizer" not in out       # ASan report marker


def test_tsan_clean():
    out = _make("tsan")
    assert "native thread tests OK" in out
    assert "WARNING: ThreadSanitizer" not in out
