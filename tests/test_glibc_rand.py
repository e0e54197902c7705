"""Verify the glibc rand() clone against the real C library.

The reference's Glorot init depends on glibc's exact stream
(`optimize-gcn/gcn.h:838-852`, std::srand(42)); we compile a tiny C program at
test time to get ground truth.
"""

import subprocess
import tempfile
from pathlib import Path

import numpy as np
import pytest

from cognn_tpu.utils.glibc_rand import RAND_MAX, GlibcRand, glorot_init

C_SRC = r"""
#include <stdio.h>
#include <stdlib.h>
int main(void) {
    srand(42);
    for (int i = 0; i < 50; ++i) printf("%d\n", rand());
    srand(7);
    for (int i = 0; i < 10; ++i) printf("%d\n", rand());
    return 0;
}
"""


@pytest.fixture(scope="module")
def c_reference():
    with tempfile.TemporaryDirectory() as td:
        src = Path(td) / "r.c"
        exe = Path(td) / "r"
        src.write_text(C_SRC)
        try:
            subprocess.run(["gcc", str(src), "-o", str(exe)], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            pytest.skip("no C compiler available")
        out = subprocess.run([str(exe)], capture_output=True, text=True,
                             check=True).stdout.split()
        vals = [int(v) for v in out]
        return vals[:50], vals[50:]


def test_matches_glibc_seed42(c_reference):
    seed42, _ = c_reference
    rng = GlibcRand(42)
    assert [rng.rand() for _ in range(50)] == seed42


def test_matches_glibc_seed7(c_reference):
    _, seed7 = c_reference
    rng = GlibcRand(7)
    assert [rng.rand() for _ in range(10)] == seed7


def test_glorot_shape_and_range():
    w = glorot_init(1433, 16)
    limit = np.sqrt(6.0 / (1433 + 16))
    assert w.shape == (1433, 16)
    assert np.all(np.abs(w) <= limit)
    # deterministic
    np.testing.assert_array_equal(w, glorot_init(1433, 16))


def test_glorot_matches_c_formula(c_reference):
    seed42, _ = c_reference
    w = glorot_init(4, 5)  # 20 draws from the seed-42 stream
    limit = np.sqrt(6.0 / 9)
    expect = np.array(seed42[:20], dtype=np.float64) / RAND_MAX * 2 * limit - limit
    np.testing.assert_allclose(w.ravel(), expect)
