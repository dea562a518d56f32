import jax
import jax.numpy as jnp
import numpy as np

from spslam_tpu.geometry import (
    se3_apply, se3_compose, se3_exp, se3_inverse, se3_log, se3_make, quat_normalize,
)
from spslam_tpu.loop.kfdb import KeyFrameDatabase
from spslam_tpu.loop.sim3 import ransac_align
from spslam_tpu.loop.vocab import Vocabulary, bow_similarity, train_vocab_bits, quantize
from spslam_tpu.ops.brief import unpack_bits
from spslam_tpu.solver.pose_graph import PoseGraphProblem, optimize_pose_graph

rng = np.random.default_rng(21)


class TestVocab:
    def test_train_and_quantize_stability(self):
        # clustered binary data: 32 prototypes with bit flips
        protos = rng.integers(0, 2, (32, 256)).astype(np.float32)
        data = np.repeat(protos, 64, axis=0)
        flips = rng.uniform(size=data.shape) < 0.05
        data = np.where(flips, 1 - data, data)
        vocab = train_vocab_bits(jnp.array(data), jax.random.PRNGKey(0), n_words=32)
        w = np.asarray(quantize(jnp.array(data), vocab, jnp.ones(len(data), bool)))
        # descriptors from the same prototype should mostly share a word
        agree = 0
        for i in range(32):
            ws = w[i * 64 : (i + 1) * 64]
            agree += np.mean(ws == np.bincount(ws).argmax())
        assert agree / 32 > 0.85

    def test_bow_similarity_discriminates(self):
        voc = Vocabulary(n_words=64, train_after=100)
        descs = rng.integers(0, 2 ** 32, (1500, 8), dtype=np.uint32)
        voc.add_training_descriptors(descs)
        assert voc.trained
        a = voc.bow_vector(descs[:300])
        a2 = voc.bow_vector(descs[:300])  # same content
        b = voc.bow_vector(descs[700:1000])
        assert bow_similarity(a, a2) > 0.95
        assert bow_similarity(a, b) < bow_similarity(a, a2)


class TestKFDB:
    def test_query_excludes_and_ranks(self):
        db = KeyFrameDatabase()
        base = {i: 1.0 / 50 for i in range(50)}
        db.add(0, base)
        db.add(1, {i: 1.0 / 50 for i in range(25, 75)})
        db.add(2, {i: 1.0 / 50 for i in range(45, 95)})
        res = db.query(base, exclude={0}, min_score=0.01)
        assert res and res[0][0] == 1
        res2 = db.query(base, exclude={0, 1}, min_score=0.01)
        assert all(k != 1 for k, _ in res2)


class TestRansacAlign:
    def test_recovers_transform_with_outliers(self):
        N = 256
        pa = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
        T_true = se3_exp(jnp.array([0.3, -0.2, 0.5, 0.2, -0.1, 0.3]))
        pb = np.array(se3_apply(T_true, jnp.array(pa)))
        pb += rng.normal(0, 0.01, pb.shape)
        n_out = 80
        out_idx = rng.choice(N, n_out, replace=False)
        pb[out_idx] += rng.uniform(0.5, 2.0, (n_out, 3))
        res = ransac_align(
            jnp.array(pa), jnp.array(pb.astype(np.float32)),
            jnp.ones(N, bool), jax.random.PRNGKey(3),
        )
        err = np.asarray(se3_log(se3_compose(res.T_ba, se3_inverse(T_true))))
        assert np.linalg.norm(err) < 0.02
        assert int(res.n_inliers) > N - n_out - 20


class TestPoseGraph:
    def test_loop_closure_removes_drift(self):
        """Chain of 40 poses with accumulated drift; a loop edge from last to
        first with the TRUE relative pose should pull the chain back."""
        K = 40
        true_poses = []
        T = jnp.array([1.0, 0, 0, 0, 0, 0, 0])
        step = se3_exp(jnp.array([0.2, 0.0, 0.0, 0.0, 2 * np.pi / K, 0.0]))
        for _ in range(K):
            true_poses.append(np.asarray(T))
            T = se3_compose(step, T)
        true_poses = np.stack(true_poses)

        # drifted odometry: noisy steps
        drift_poses = [true_poses[0]]
        for i in range(1, K):
            rel = se3_compose(jnp.array(true_poses[i]), se3_inverse(jnp.array(true_poses[i - 1])))
            noise = se3_exp(jnp.array(rng.normal(0, 0.01, 6).astype(np.float32)))
            drift_poses.append(np.asarray(se3_compose(se3_compose(noise, rel), jnp.array(drift_poses[-1]))))
        drift_poses = np.stack(drift_poses)
        drift0 = np.linalg.norm(drift_poses[-1][4:] - true_poses[-1][4:])

        # graph: odometry edges with measured rel = drifted rel (consistent),
        # plus one loop edge with TRUE relative pose last->first
        ei, ej, eT, ew = [], [], [], []
        for i in range(1, K):
            rel = se3_compose(jnp.array(drift_poses[i - 1]), se3_inverse(jnp.array(drift_poses[i])))
            ei.append(i - 1), ej.append(i), eT.append(np.asarray(rel)), ew.append(1.0)
        rel_loop = se3_compose(jnp.array(true_poses[0]), se3_inverse(jnp.array(true_poses[-1])))
        ei.append(0), ej.append(K - 1), eT.append(np.asarray(rel_loop)), ew.append(5.0)

        E = len(ei)
        prob = PoseGraphProblem(
            poses=jnp.array(drift_poses),
            fixed=jnp.array([True] + [False] * (K - 1)),
            valid=jnp.ones(K, bool),
            edge_i=jnp.array(ei, jnp.int32),
            edge_j=jnp.array(ej, jnp.int32),
            edge_T=jnp.array(np.stack(eT)),
            edge_w=jnp.array(ew, jnp.float32),
            edge_valid=jnp.ones(E, bool),
        )
        out = np.asarray(optimize_pose_graph(prob, n_iters=25))
        end_err = np.linalg.norm(out[-1][4:] - true_poses[-1][4:])
        assert end_err < 0.05, (drift0, end_err)
        # overall trajectory should improve substantially
        tot_before = np.linalg.norm(drift_poses[:, 4:] - true_poses[:, 4:], axis=1).mean()
        tot_after = np.linalg.norm(out[:, 4:] - true_poses[:, 4:], axis=1).mean()
        assert tot_after < 0.5 * tot_before
