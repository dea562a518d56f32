"""Native C++ components vs their Python fallbacks (identical semantics)."""

import numpy as np
import pytest

from spslam_tpu.loop.kfdb import KeyFrameDatabase
from spslam_tpu.native.bindings import covis_count, get_lib

rng = np.random.default_rng(5)


def random_bow(n_words=256, n=40):
    words = rng.choice(n_words, n, replace=False)
    w = rng.uniform(0.1, 1.0, n)
    w /= w.sum()
    return {int(k): float(v) for k, v in zip(words, w)}


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no compiler?)")
    return lib


class TestNativeBow:
    def test_native_builds(self, lib):
        db = KeyFrameDatabase(n_words=256)
        assert db.is_native

    def test_query_matches_python(self, lib):
        native = KeyFrameDatabase(n_words=256, use_native=True)
        pure = KeyFrameDatabase(n_words=256, use_native=False)
        assert native.is_native and not pure.is_native
        bows = [random_bow() for _ in range(30)]
        for i, b in enumerate(bows):
            native.add(i, b)
            pure.add(i, b)
        q = bows[7]
        for excl in (set(), {7}, {7, 8, 9}):
            rn = native.query(q, excl, 0.01, max_results=10)
            rp = pure.query(q, excl, 0.01, max_results=10)
            assert [k for k, _ in rn] == [k for k, _ in rp], (rn, rp)
            for (k1, s1), (k2, s2) in zip(rn, rp):
                assert abs(s1 - s2) < 1e-5

    def test_erase(self, lib):
        db = KeyFrameDatabase(n_words=256)
        b = random_bow()
        db.add(1, b)
        db.add(2, random_bow())
        db.erase(1)
        res = db.query(b, set(), 0.0)
        assert all(k != 1 for k, _ in res)

    def test_pair_score_matches(self, lib):
        from spslam_tpu.loop.vocab import bow_similarity

        native = KeyFrameDatabase(n_words=256)
        a, b = random_bow(), random_bow()
        native.add(0, a)
        native.add(1, b)
        assert abs(native.similarity(0, 1) - bow_similarity(a, b)) < 1e-5


class TestNativeCovis:
    def test_matches_numpy(self, lib):
        n_kp, n_pts, obs_cap, n_kf = 64, 128, 8, 10
        kf_obs = rng.integers(-1, n_pts, n_kp).astype(np.int32)
        pt_obs_kf = rng.integers(-1, n_kf, (n_pts, obs_cap)).astype(np.int32)
        kf = 3
        out = covis_count(kf_obs, pt_obs_kf, kf, n_kf)
        # numpy oracle
        want = np.zeros(n_kf, np.int64)
        for p in kf_obs:
            if p < 0:
                continue
            for k2 in pt_obs_kf[p]:
                if k2 >= 0 and k2 != kf and k2 < n_kf:
                    want[k2] += 1
        np.testing.assert_array_equal(out, want)
