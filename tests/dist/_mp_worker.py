"""Worker process for the 2-process distributed-BA exercise
(tests/dist/test_multiprocess.py): initializes the jax distributed runtime
against a local coordinator, builds the GLOBAL device mesh spanning both
processes, and runs dist_bundle_adjust with its psum collectives crossing
the process boundary (the DCN path of SURVEY.md §2.2's comm row).

Usage: python _mp_worker.py <process_id> <num_processes> <coordinator>
"""

import os
import sys


def main():
    proc_id, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    # 2 virtual CPU devices per process -> a 4-device global mesh
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from spslam_tpu.parallel.dist_ba import (
        dist_bundle_adjust,
        global_mesh,
        init_distributed,
        partition_problem,
    )

    import jax

    # the sandbox's sitecustomize pins the axon/TPU platform via jax config,
    # so the env var alone is not enough (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    assert init_distributed(coord, nproc, proc_id), "init_distributed refused"
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == nproc, jax.process_count()
    mesh = global_mesh()
    D = len(jax.devices())
    assert D == 2 * nproc, D

    # identical synthetic problem on every process (seeded)
    from test_dist_ba import INTR, make_problem

    (poses_init, fixed, pts_init, oc, op, ouv, our, _, _) = make_problem(
        n_cams=6, n_pts=256
    )
    prob = partition_problem(
        poses_init, fixed, pts_init, oc, op, ouv, our,
        np.ones(len(oc), np.float32), n_shards=D, strategy="segments",
    )

    # lift the host-identical arrays into global jax.Arrays laid out over the
    # multi-process mesh (sharded fields split on the leading device axis)
    def lift(x, spec):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, spec), lambda idx: x[idx]
        )

    sharded = P("ba")
    gprob = prob._replace(
        poses=lift(prob.poses, P()),
        pose_fixed=lift(prob.pose_fixed, P()),
        pose_valid=lift(prob.pose_valid, P()),
        points=lift(prob.points, sharded),
        point_valid=lift(prob.point_valid, sharded),
        obs_cam=lift(prob.obs_cam, sharded),
        obs_pt=lift(prob.obs_pt, sharded),
        obs_uv=lift(prob.obs_uv, sharded),
        obs_ur=lift(prob.obs_ur, sharded),
        obs_inv_sigma2=lift(prob.obs_inv_sigma2, sharded),
        obs_valid=lift(prob.obs_valid, sharded),
        pt_obs=lift(prob.pt_obs, sharded),
    )

    _, _, cost0 = dist_bundle_adjust(gprob, INTR, mesh, n_iters=0)
    poses, _, cost = dist_bundle_adjust(gprob, INTR, mesh, n_iters=6)
    c0, c1 = float(cost0), float(cost)  # replicated outputs: addressable
    assert np.isfinite(c1) and c1 < 0.5 * c0, (c0, c1)
    print(f"MP_OK proc={proc_id} devices={D} cost {c0:.1f} -> {c1:.1f}", flush=True)


if __name__ == "__main__":
    main()
