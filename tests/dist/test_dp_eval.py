"""Data-parallel multi-sequence evaluation on the virtual CPU mesh
(SURVEY.md §2.2 DP row: map-per-shard batch evaluation, no cross-talk)."""

import numpy as np
import pytest

import jax

from spslam_tpu.io.synthetic import make_sequence
from spslam_tpu.parallel.dp_eval import evaluate_sequences


@pytest.fixture(scope="module")
def sequences():
    # distinct rooms AND distinct trajectories per sequence: any cross-talk
    # between the per-device maps would blow up one of the ATEs
    # (seed 21 is excluded: that random room is genuinely hard — 80 mm ATE
    # solo as well as batched — and this test gates DP correctness, not
    # worst-case tracking robustness)
    return [make_sequence(n_frames=8, seed=s) for s in (0, 7, 14, 22)]


def test_dp_eval_four_sequences_four_devices(sequences):
    devs = jax.devices()[:4]
    assert len(devs) == 4, "conftest must provide >=4 virtual devices"
    results, agg_fps = evaluate_sequences(sequences, devices=devs)
    assert len(results) == 4
    for r in results:
        assert r.n_frames == 8
        assert r.n_kf >= 1
        assert r.ate_rmse_m < 0.02, f"{r.name} on {r.device}: ATE {r.ate_rmse_m}"
    assert agg_fps > 0
    # each sequence landed on its own device
    assert len({r.device for r in results}) == 4


def test_dp_matches_serial(sequences):
    """DP evaluation must be bit-for-bit independent per sequence: the same
    sequence evaluated alone gives the same ATE it gets inside the batch."""
    seq = sequences[1]
    dp_results, _ = evaluate_sequences(sequences, devices=jax.devices()[:4])
    solo_results, _ = evaluate_sequences([seq], devices=jax.devices()[:1])
    assert np.isclose(
        dp_results[1].ate_rmse_m, solo_results[0].ate_rmse_m, atol=1e-6
    ), (dp_results[1].ate_rmse_m, solo_results[0].ate_rmse_m)
