"""Merge-path sort (ops/psort) parity vs jax.lax.sort.

The fast path is NOT stable, so with duplicate keys the comparison is on
the sorted key array plus the (key, payload) multiset; with unique keys
the full output must match lax.sort exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from particle_sim_tpu.ops import psort


def _check(ops, n_unique_keys=None):
    got = psort.sort(tuple(jnp.asarray(o) for o in ops), interpret=True)
    want = jax.lax.sort(tuple(jnp.asarray(o) for o in ops), num_keys=1)
    got = [np.asarray(g) for g in got]
    want = [np.asarray(w) for w in want]
    np.testing.assert_array_equal(got[0], want[0])
    if len(ops) == 1:
        return
    uniq = len(np.unique(np.asarray(ops[0]))) == len(np.asarray(ops[0]))
    if uniq:
        for g, w in zip(got[1:], want[1:]):
            np.testing.assert_array_equal(g, w)
    else:
        # unstable: compare (key, payload...) row multisets
        g_rows = np.stack([g.view(np.uint32) for g in got])
        w_rows = np.stack([w.view(np.uint32) for w in want])
        order_g = np.lexsort(g_rows[::-1])
        order_w = np.lexsort(w_rows[::-1])
        np.testing.assert_array_equal(g_rows[:, order_g], w_rows[:, order_w])


@pytest.mark.slow
@pytest.mark.parametrize("n", [65536, 262144])
def test_unique_keys_with_payloads(n):
    rng = np.random.default_rng(0)
    key = rng.permutation(n).astype(np.uint32)
    p1 = np.arange(n, dtype=np.int32)
    p2 = rng.standard_normal(n).astype(np.float32)
    _check([key, p1, p2])


@pytest.mark.slow
def test_i32_keys():
    rng = np.random.default_rng(1)
    n = 65536
    key = rng.integers(-(2**31), 2**31 - 1, n, dtype=np.int64)
    key = key.astype(np.int32)
    p = np.arange(n, dtype=np.int32)
    _check([key, p])


@pytest.mark.parametrize("case", [
    pytest.param("duplicates", marks=pytest.mark.slow), "all_equal",
    "sorted", "reversed", "clustered", "sentinel_tail"])
def test_adversarial_distributions(case):
    rng = np.random.default_rng(2)
    n = 131072
    if case == "duplicates":
        key = rng.integers(0, 50, n).astype(np.uint32)
    elif case == "all_equal":
        key = np.full(n, 7, np.uint32)
    elif case == "sorted":
        key = np.sort(rng.integers(0, 1 << 30, n)).astype(np.uint32)
    elif case == "reversed":
        key = np.sort(rng.integers(0, 1 << 30, n))[::-1].astype(np.uint32)
    elif case == "clustered":
        key = (rng.integers(0, 4, n) * (1 << 28)
               + rng.integers(0, 100, n)).astype(np.uint32)
    else:  # sentinel_tail: PM-style — real keys then a run of key-max
        key = np.sort(rng.integers(0, 1 << 21, n)).astype(np.uint32)
        key[n // 2:] = 0xFFFFFFFF
        rng.shuffle(key)
    p = np.arange(n, dtype=np.int32)
    _check([key, p])


def test_key_only():
    rng = np.random.default_rng(3)
    key = rng.integers(0, 1 << 31, 65536).astype(np.uint32)
    _check([key])


def test_padded_and_fallback_shapes():
    # 32768/1000: below the fast-path floor -> lax.sort; 98304/80000:
    # padded (opt-in) with key-max dummies to 131072 then sliced back
    for n in (32768, 98304, 80000, 1000):
        key = np.random.default_rng(4).permutation(n).astype(np.uint32)
        p = np.arange(n, dtype=np.int32)
        got = psort.sort((jnp.asarray(key), jnp.asarray(p)), interpret=True,
                         pad_to_pow2=True)
        want = jax.lax.sort((jnp.asarray(key), jnp.asarray(p)), num_keys=1)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_can_fast_sort():
    assert psort.can_fast_sort(2 * psort.SEG)
    assert psort.can_fast_sort(1 << 24)
    assert not psort.can_fast_sort(psort.SEG)   # single block: no merge
    assert not psort.can_fast_sort(3 * psort.SEG)
    assert not psort.can_fast_sort(psort.SEG + 512)  # not a SEG multiple
