import numpy as np
import pytest

from multimodalworddiscovery_tpu.native import HAVE_NATIVE, pack_token_file


@pytest.fixture()
def token_file(tmp_path):
    p = tmp_path / "caps.txt"
    p.write_text("1 2 3\n7 8\n\n42\n5 5 5 5 5 5\n")
    return p


def test_python_fallback_parses(token_file):
    arr, lens, vmax = pack_token_file(token_file, force_python=True)
    assert arr.shape == (4, 6)  # blank line skipped
    np.testing.assert_array_equal(lens, [3, 2, 1, 6])
    assert vmax == 42
    np.testing.assert_array_equal(arr[0], [1, 2, 3, 0, 0, 0])
    np.testing.assert_array_equal(arr[3], [5] * 6)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
def test_native_matches_python(token_file):
    a1, l1, v1 = pack_token_file(token_file, force_python=True)
    a2, l2, v2 = pack_token_file(token_file)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(l1, l2)
    assert v1 == v2


@pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
def test_native_matches_python_large_random(tmp_path):
    rng = np.random.default_rng(0)
    lines = []
    for _ in range(500):
        n = int(rng.integers(1, 60))
        lines.append(" ".join(str(int(x)) for x in rng.integers(0, 10000, n)))
    p = tmp_path / "big.txt"
    p.write_text("\n".join(lines))  # no trailing newline: exercises that path
    a1, l1, v1 = pack_token_file(p, pad_multiple=8, force_python=True)
    a2, l2, v2 = pack_token_file(p, pad_multiple=8)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(l1, l2)
    assert v1 == v2
    assert a1.shape[1] % 8 == 0


@pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
def test_native_is_faster(tmp_path):
    import time

    rng = np.random.default_rng(1)
    lines = [" ".join(str(int(x)) for x in rng.integers(0, 100, 40)) for _ in range(20000)]
    p = tmp_path / "huge.txt"
    p.write_text("\n".join(lines) + "\n")

    t0 = time.perf_counter()
    pack_token_file(p, force_python=True)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    pack_token_file(p)
    t_c = time.perf_counter() - t0
    assert t_c < t_py, (t_c, t_py)
