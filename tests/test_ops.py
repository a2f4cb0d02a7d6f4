import numpy as np
import jax.numpy as jnp
import pytest

from deeppointmap_tpu.ops.neighbors import pairwise_dist2, knn, hybrid_query, group_points
from deeppointmap_tpu.ops.sampling import farthest_point_sampling
from deeppointmap_tpu.ops.kabsch import ransac_kabsch, weighted_kabsch
from deeppointmap_tpu.ops.infomat import information_matrix
from deeppointmap_tpu.utils import se3 as s


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def np_dist2(a, b):
    return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)


class TestNeighbors:
    def test_pairwise_dist2(self, rng):
        a = rng.normal(size=(37, 3)).astype(np.float32)
        b = rng.normal(size=(53, 3)).astype(np.float32)
        got = np.asarray(pairwise_dist2(jnp.asarray(a), jnp.asarray(b)))
        # the |a|^2 - 2ab + |b|^2 form cancels; ~1e-3 absolute is expected
        assert np.allclose(got, np_dist2(a, b), atol=5e-3)

    def test_knn_matches_numpy(self, rng):
        pts = rng.normal(size=(256, 3)).astype(np.float32) * 5
        ctr = rng.normal(size=(64, 3)).astype(np.float32) * 5
        valid = np.ones(256, dtype=bool)
        valid[200:] = False
        idx, d2 = knn(jnp.asarray(pts), jnp.asarray(ctr), 8, jnp.asarray(valid))
        idx, d2 = np.asarray(idx), np.asarray(d2)

        ref = np_dist2(ctr, pts)
        ref[:, ~valid] = np.inf
        ref_idx = np.argsort(ref, axis=1)[:, :8]
        # same distance sets (ties may permute indices)
        assert np.allclose(np.sort(d2, 1), np.sort(np.take_along_axis(ref, ref_idx, 1), 1), atol=1e-3)
        assert not np.any(idx >= 200), "invalid points must never be neighbors"

    def test_knn_chunked_equals_unchunked(self, rng):
        pts = rng.normal(size=(128, 3)).astype(np.float32)
        ctr = rng.normal(size=(64, 3)).astype(np.float32)
        valid = np.ones(128, dtype=bool)
        i1, d1 = knn(jnp.asarray(pts), jnp.asarray(ctr), 4, jnp.asarray(valid), center_chunk=16)
        i2, d2 = knn(jnp.asarray(pts), jnp.asarray(ctr), 4, jnp.asarray(valid), center_chunk=4096)
        assert np.allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)

    def test_hybrid_query_clamps_to_nearest(self, rng):
        # one tight cluster + one faraway point; radius keeps only cluster
        pts = np.concatenate([rng.normal(size=(31, 3)).astype(np.float32) * 0.01,
                              np.array([[100.0, 0, 0]], dtype=np.float32)])
        ctr = np.zeros((1, 3), dtype=np.float32)
        valid = np.ones(32, dtype=bool)
        idx = np.asarray(hybrid_query(jnp.asarray(pts), jnp.asarray(ctr), 32, 1.0, jnp.asarray(valid)))
        assert 31 not in idx, "out-of-radius neighbor must be replaced"
        # replacement is the nearest neighbor
        nearest = np.argmin(np_dist2(ctr, pts)[0])
        assert np.sum(idx == nearest) >= 2

    def test_group_points(self, rng):
        vals = rng.normal(size=(16, 5)).astype(np.float32)
        idx = rng.integers(0, 16, size=(4, 3))
        out = np.asarray(group_points(jnp.asarray(vals), jnp.asarray(idx)))
        assert np.allclose(out, vals[idx])


def np_fps(xyz, n_valid, k):
    """Reference-faithful python FPS (reference: network/encoder/utils.py:209-270)."""
    sel = [0]
    closest = np.full(n_valid, np.inf)
    for _ in range(1, min(k, n_valid)):
        d = ((xyz[:n_valid] - xyz[sel[-1]]) ** 2).sum(-1)
        closest = np.minimum(closest, d)
        closest[sel] = -1  # equivalent: selected points have dist 0 anyway
        sel.append(int(np.argmax(closest)))
    return sel


class TestFPS:
    def test_matches_reference_order(self, rng):
        xyz = rng.normal(size=(64, 3)).astype(np.float32) * 10
        valid = np.ones(64, dtype=bool)
        idx, m = farthest_point_sampling(jnp.asarray(xyz), jnp.asarray(valid), 16)
        ref = np_fps(xyz, 64, 16)
        assert np.asarray(idx).tolist() == ref
        assert np.asarray(m).all()

    def test_never_selects_invalid(self, rng):
        xyz = rng.normal(size=(64, 3)).astype(np.float32)
        xyz[40:] = 1000.0  # invalid points are far away -- tempting for FPS
        valid = np.zeros(64, dtype=bool)
        valid[:40] = True
        idx, m = farthest_point_sampling(jnp.asarray(xyz), jnp.asarray(valid), 16)
        assert np.asarray(idx).max() < 40

    def test_padding_when_too_few_valid(self, rng):
        xyz = rng.normal(size=(32, 3)).astype(np.float32)
        valid = np.zeros(32, dtype=bool)
        valid[:5] = True
        idx, m = farthest_point_sampling(jnp.asarray(xyz), jnp.asarray(valid), 8)
        m = np.asarray(m)
        assert m[:5].all() and not m[5:].any()
        assert np.asarray(idx)[:5].max() < 5

    def test_coverage_property(self, rng):
        # FPS picks are far apart: min pairwise distance among selected
        # should exceed that of a random pick on average
        xyz = rng.uniform(size=(512, 3)).astype(np.float32)
        valid = np.ones(512, dtype=bool)
        idx, _ = farthest_point_sampling(jnp.asarray(xyz), jnp.asarray(valid), 32)
        sel = xyz[np.asarray(idx)]
        d = np_dist2(sel, sel) + np.eye(32) * 1e9
        rand = xyz[rng.choice(512, 32, replace=False)]
        dr = np_dist2(rand, rand) + np.eye(32) * 1e9
        assert d.min() > dr.min()


class TestKabsch:
    def _make_problem(self, rng, k=256, noise=0.0, outliers=0):
        R = s.so3_exp(rng.normal(size=3))
        t = rng.normal(size=3) * 5
        src = rng.normal(size=(k, 3)) * 10
        dst = src @ R.T + t
        if noise:
            dst = dst + rng.normal(size=(k, 3)) * noise
        w = np.clip(rng.uniform(0.4, 1.0, size=k), 0, 1)
        if outliers:
            bad = rng.choice(k, outliers, replace=False)
            dst[bad] += rng.normal(size=(outliers, 3)) * 20
            # dual-softmax confidence of a wrong pair is low
            w[bad] = rng.uniform(0.0, 0.3, size=outliers)
        return (src.astype(np.float32), dst.astype(np.float32),
                w.astype(np.float32), R, t)

    def test_exact_recovery(self, rng):
        src, dst, w, R, t = self._make_problem(rng)
        valid = np.ones(len(src), dtype=bool)
        Rj, tj, inl, rmse = weighted_kabsch(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), jnp.asarray(valid))
        assert np.allclose(np.asarray(Rj), R, atol=1e-4)
        assert np.allclose(np.asarray(tj), t, atol=1e-3)
        assert float(rmse) < 1e-3

    def test_outlier_rejection(self, rng):
        src, dst, w, R, t = self._make_problem(rng, noise=0.01, outliers=40)
        valid = np.ones(len(src), dtype=bool)
        Rj, tj, inl, rmse = weighted_kabsch(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), jnp.asarray(valid))
        assert s.rotation_angle(np.asarray(Rj, dtype=np.float64).T @ R) < 0.01
        assert np.linalg.norm(np.asarray(tj) - t) < 0.1
        assert float(rmse) < 0.05

    def test_padded_pairs_ignored(self, rng):
        src, dst, w, R, t = self._make_problem(rng, k=128)
        # append garbage padding
        src_p = np.concatenate([src, np.zeros((64, 3), np.float32)])
        dst_p = np.concatenate([dst, rng.normal(size=(64, 3)).astype(np.float32) * 100])
        w_p = np.concatenate([w, np.ones(64, np.float32)])
        valid = np.concatenate([np.ones(128, bool), np.zeros(64, bool)])
        Rj, tj, inl, rmse = weighted_kabsch(
            jnp.asarray(src_p), jnp.asarray(dst_p), jnp.asarray(w_p), jnp.asarray(valid))
        assert np.allclose(np.asarray(Rj), R, atol=1e-4)
        assert not np.asarray(inl)[128:].any()

    def test_ransac_heavy_contamination(self, rng):
        """ransac_kabsch must recover the motion where the reference
        trimming rule cannot: >50% CONFIDENT outliers (the occluded-eval
        regime diagnosed in BASELINE.md round 5)."""
        k = 256
        R = s.so3_exp(rng.normal(size=3) * 0.2)
        t = rng.normal(size=3) * 3
        src = rng.normal(size=(k, 3)) * 15
        dst = src @ R.T + t + rng.normal(size=(k, 3)) * 0.02
        bad = rng.choice(k, 150, replace=False)   # 59% outliers...
        dst[bad] += rng.normal(size=(150, 3)) * 4
        w = np.clip(rng.uniform(0.4, 1.0, size=k), 0, 1)  # ...all confident
        valid = np.ones(k, bool)
        Rj, tj, inl, rmse = ransac_kabsch(
            jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32),
            jnp.asarray(w, jnp.float32), jnp.asarray(valid))
        assert s.rotation_angle(np.asarray(Rj, np.float64).T @ R) < 0.01
        assert np.linalg.norm(np.asarray(tj) - t) < 0.1
        # reported rmse = inlier rmse / weighted coverage: ~0.03/0.4
        assert float(rmse) < 0.2
        # inliers exclude (nearly) all planted outliers
        assert np.asarray(inl)[bad].sum() <= 3

    def test_ransac_rmse_degrades_with_coverage(self, rng):
        """The reported rmse must rise as the consensus covers less of
        the confident weight -- the signal the SLAM gates/keyframe EMA
        rely on (a coverage-blind inlier rmse reads 'perfect' on 13 m
        failures; BASELINE.md round 5)."""
        def solve_with_outlier_count(n_bad):
            r = np.random.default_rng(7)
            k = 256
            R = s.so3_exp(np.array([0.05, -0.1, 0.2]))
            t = np.array([1.0, -2.0, 0.5])
            src = r.normal(size=(k, 3)) * 15
            dst = src @ R.T + t + r.normal(size=(k, 3)) * 0.02
            bad = r.choice(k, n_bad, replace=False)
            dst[bad] += r.normal(size=(n_bad, 3)) * 8
            w = np.full(k, 0.9, np.float32)
            _, _, _, rmse = ransac_kabsch(
                jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32),
                jnp.asarray(w), jnp.ones(k, bool))
            return float(rmse)
        clean, half, most = (solve_with_outlier_count(n)
                             for n in (0, 128, 224))
        assert clean < half < most
        assert most > 4 * clean

    def test_ransac_matches_weighted_on_clean(self, rng):
        """On a clean low-noise problem both solvers agree (safe to flip
        the tpu.robust_register default later if A/Bs stay neutral)."""
        src, dst, w, R, t = self._make_problem(rng, noise=0.01)
        valid = np.ones(len(src), bool)
        Rr, tr, _, _ = ransac_kabsch(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w),
            jnp.asarray(valid))
        assert s.rotation_angle(np.asarray(Rr, np.float64).T @ R) < 0.005
        assert np.linalg.norm(np.asarray(tr) - t) < 0.05

    def test_ransac_padded_pairs_ignored(self, rng):
        src, dst, w, R, t = self._make_problem(rng, k=128)
        src_p = np.concatenate([src, np.zeros((64, 3), np.float32)])
        dst_p = np.concatenate([dst, rng.normal(size=(64, 3)).astype(np.float32) * 100])
        w_p = np.concatenate([w, np.ones(64, np.float32)])
        valid = np.concatenate([np.ones(128, bool), np.zeros(64, bool)])
        Rj, tj, inl, _ = ransac_kabsch(
            jnp.asarray(src_p), jnp.asarray(dst_p), jnp.asarray(w_p),
            jnp.asarray(valid))
        assert np.allclose(np.asarray(Rj), R, atol=1e-3)
        assert not np.asarray(inl)[128:].any()

    def test_fp32_vs_fp64_oracle(self, rng):
        # fp32 TPU-style solve must stay within 1e-4 rad of an fp64 solve
        src, dst, w, R, t = self._make_problem(rng, k=512, noise=0.05)
        valid = np.ones(len(src), dtype=bool)
        Rj, tj, _, _ = weighted_kabsch(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), jnp.asarray(valid))
        # fp64 oracle: plain weighted kabsch without trimming
        w64 = w.astype(np.float64)
        cs = (src * w64[:, None]).sum(0) / w64.sum()
        cd = (dst * w64[:, None]).sum(0) / w64.sum()
        S = ((src - cs) * w64[:, None]).T @ (dst - cd)
        u, _, vt = np.linalg.svd(S)
        R64 = vt.T @ u.T
        assert s.rotation_angle(np.asarray(Rj, np.float64).T @ R64) < 5e-3


class TestInfoMat:
    def test_matches_numpy_oracle(self, rng):
        src = rng.normal(size=(128, 3)).astype(np.float32) * 3
        R = s.so3_exp(rng.normal(size=3) * 0.1).astype(np.float32)
        t = (rng.normal(size=3) * 0.1).astype(np.float32)
        dst = (src @ R.T + t + rng.normal(size=(128, 3)).astype(np.float32) * 0.05)
        valid = np.ones(128, dtype=bool)
        got = np.asarray(information_matrix(
            jnp.asarray(src), jnp.asarray(valid),
            jnp.asarray(dst), jnp.asarray(valid),
            jnp.asarray(R), jnp.asarray(t)))

        # numpy oracle replicating reference: system/modules/utils.py:71-104
        moved = src @ R.T + t
        d2 = np_dist2(moved, dst)
        idx = d2.argmin(1)
        m = d2[np.arange(128), idx] <= 1.0
        tt = dst[idx][m]
        GTG = np.zeros((6, 6))
        for x, y, z in tt:
            for g in ([0, z, -y, 1, 0, 0], [-z, 0, x, 0, 1, 0], [y, -x, 0, 0, 0, 1]):
                g = np.array(g, dtype=np.float64)[:, None]
                GTG += g @ g.T
        assert np.allclose(got, GTG, rtol=1e-3, atol=1e-2)

    def test_stride_estimate_tracks_full_sum(self, rng):
        """infomat_stride: the strided G^T G (rescaled) must match the
        full sum to sampling noise (~1/sqrt(N/stride)) and keep the same
        eigenstructure -- it feeds pose-graph edge WEIGHTS, so relative
        fidelity is what matters."""
        n = 4096
        src = rng.normal(size=(n, 3)).astype(np.float32) * 5
        R = s.so3_exp(rng.normal(size=3) * 0.05).astype(np.float32)
        t = (rng.normal(size=3) * 0.1).astype(np.float32)
        dst = (src @ R.T + t
               + rng.normal(size=(n, 3)).astype(np.float32) * 0.03)
        valid = np.ones(n, dtype=bool)
        args = (jnp.asarray(src), jnp.asarray(valid), jnp.asarray(dst),
                jnp.asarray(valid), jnp.asarray(R), jnp.asarray(t))
        full = np.asarray(information_matrix(*args))
        est = np.asarray(information_matrix(*args, stride=4))
        rel = np.linalg.norm(est - full) / np.linalg.norm(full)
        assert rel < 0.05, rel
        wf, vf = np.linalg.eigh(full)
        we = np.linalg.eigvalsh(est)
        # eigenvalues within 5%; the full matrix's eigenbasis must see
        # the same quadratic form in the estimate (isotropic clouds have
        # near-degenerate top eigenpairs, so comparing individual
        # eigenVECTORS would be ill-posed)
        assert np.allclose(we, wf, rtol=0.05)
        quad = np.diag(vf.T @ est @ vf)
        assert np.allclose(quad, wf, rtol=0.05)

    def test_symmetry_and_psd(self, rng):
        src = rng.normal(size=(64, 3)).astype(np.float32)
        valid = np.ones(64, dtype=bool)
        got = np.asarray(information_matrix(
            jnp.asarray(src), jnp.asarray(valid),
            jnp.asarray(src), jnp.asarray(valid),
            jnp.eye(3, dtype=np.float32), np.zeros(3, dtype=np.float32)))
        assert np.allclose(got, got.T, atol=1e-3)
        assert np.linalg.eigvalsh(got).min() > -1e-3


class TestBallQuery:
    def test_first_k_within_radius(self):
        import jax.numpy as jnp
        from deeppointmap_tpu.ops.neighbors import ball_query

        rng = np.random.default_rng(5)
        pts = jnp.asarray(rng.uniform(-2, 2, size=(200, 3)).astype(np.float32))
        centers = pts[:16]
        valid = jnp.ones((200,), bool)
        r, k = 1.0, 8
        idx = np.asarray(ball_query(pts, centers, k, r, valid))
        p = np.asarray(pts)
        for s in range(16):
            d2 = ((p - p[s]) ** 2).sum(1)
            inside = np.nonzero(d2 <= r * r)[0]
            expect = inside[:k]
            got = idx[s]
            # the first len(expect) entries are the lowest-index in-ball
            # points ascending; the rest repeat the first
            np.testing.assert_array_equal(np.sort(got[:len(expect)]),
                                          expect if len(expect) >= k
                                          else expect)
            if len(inside) < k:
                assert set(got[len(inside):].tolist()) == {got[0]}

    def test_masked_points_excluded(self):
        import jax.numpy as jnp
        from deeppointmap_tpu.ops.neighbors import ball_query

        pts = jnp.asarray(np.stack([np.linspace(0, 1, 50)] * 3, 1)
                          .astype(np.float32))
        valid = jnp.arange(50) < 25
        idx = np.asarray(ball_query(pts, pts[:4], 6, 10.0, valid))
        assert idx.max() < 25


class TestVoxelSample:
    """voxel_sample vs a NumPy oracle of the reference algorithm
    (network/encoder/utils.py:149-207): per-voxel representative = point
    nearest its voxel center, voxels ranked by point count, top-k kept."""

    def _oracle(self, xyz, valid, k, voxel_size, sample_range):
        p = xyz.copy()
        p[~valid] = 2.0 * sample_range
        pmin = p.min(0)
        dims = np.floor((p.max(0) - pmin) / voxel_size) + 1
        in_range = (np.sum(p * p, -1) <= sample_range ** 2) & valid
        rel = p - pmin
        vxyz = np.floor(rel / voxel_size)
        vid = vxyz[:, 0] + vxyz[:, 1] * dims[0] + vxyz[:, 2] * dims[0] * dims[1]
        dis = np.sum((rel - vxyz * voxel_size - voxel_size / 2) ** 2, -1)
        order = np.lexsort((dis, np.where(in_range, vid, np.inf)))
        reps, counts = [], []
        i = 0
        ids = vid[order]
        ir = in_range[order]
        while i < len(ids):
            j = i
            while j < len(ids) and ids[j] == ids[i]:
                j += 1
            if ir[i]:
                reps.append(order[i])
                counts.append(j - i)
            i = j
        sel = np.argsort(-np.asarray(counts), kind="stable")[:k]
        return set(np.asarray(reps)[sel].tolist()), np.asarray(counts)[sel]

    def test_matches_reference_oracle(self):
        import jax.numpy as jnp
        from deeppointmap_tpu.ops.sampling import voxel_sample

        rng = np.random.default_rng(5)
        xyz = rng.uniform(-1.2, 1.2, (400, 3)).astype(np.float32)
        valid = np.ones(400, bool)
        valid[370:] = False
        k = 48
        idx, sv = voxel_sample(jnp.asarray(xyz), jnp.asarray(valid), k,
                               voxel_size=0.25, sample_range=1.0)
        idx, sv = np.asarray(idx), np.asarray(sv)
        want, want_counts = self._oracle(xyz, valid, k, 0.25, 1.0)
        assert sv.sum() == min(k, len(want))
        got = set(idx[sv].tolist())
        # ties in voxel count can swap the k-th voxel; demand >= 95% overlap
        assert len(got & want) >= 0.95 * len(want), (got, want)

    def test_fewer_voxels_than_k(self):
        import jax.numpy as jnp
        from deeppointmap_tpu.ops.sampling import voxel_sample

        rng = np.random.default_rng(6)
        xyz = rng.uniform(-0.3, 0.3, (100, 3)).astype(np.float32)
        valid = np.ones(100, bool)
        idx, sv = voxel_sample(jnp.asarray(xyz), jnp.asarray(valid), 64,
                               voxel_size=0.3, sample_range=1.0)
        sv = np.asarray(sv)
        n_vox = sv.sum()
        assert 0 < n_vox < 64          # tiny cloud -> few occupied voxels
        assert not sv[n_vox:].any()    # padding marked invalid

    def test_encoder_with_voxel_stage(self):
        """Encoder built from a config with a voxel sampler stage runs and
        produces valid tokens."""
        import jax
        import jax.numpy as jnp
        from deeppointmap_tpu.config import Config
        from deeppointmap_tpu.models import Encoder

        args = Config(encoder=dict(
            npoint=[64, 32, 16],
            radius_list=[[0.05, 0.1], [0.1, 0.2], [0.2, 0.4]],
            nsample_list=[[8, 8], [8, 8], [8, 8]],
            in_channel=3, out_channel=16, width=8, expansion=4,
            upsample_layers=2, norm="LN", bias=True,
            sample=[{"type": "voxel", "size": 0.05, "range": 1.0},
                    {"type": "fps"}, {"type": "fps"}]))
        enc = Encoder.from_config(args)
        assert enc.sample[0][0] == "voxel" and enc.sample[1][0] == "fps"
        rng = np.random.default_rng(7)
        pts = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 256, 3)),
                          jnp.float32)
        valid = jnp.ones((1, 256), bool)
        params = jax.jit(enc.init)(jax.random.PRNGKey(0), pts, valid)
        coor, fea, v = jax.jit(enc.apply)(params, pts, valid)
        assert coor.shape == (1, 64, 3) and fea.shape == (1, 64, 16)
        assert bool(np.asarray(v).any())
        assert np.isfinite(np.asarray(fea)).all()


def test_radius_normals_fp64_oracle():
    """radius_normals (moment accumulation + per-center re-centering)
    vs an fp64 radius-PCA oracle, on a planar patch placed FAR from the
    origin -- the regime where a naive E[pp^T] - mu mu^T covariance
    loses the signal to f32 cancellation."""
    import jax.numpy as jnp

    from deeppointmap_tpu.ops.normals import radius_normals

    rng = np.random.default_rng(3)
    plane = np.concatenate([rng.normal(0, 0.5, (256, 2)),
                            rng.normal(0, 0.01, (256, 1))], axis=1)
    pts = (plane + np.array([40.0, -25.0, 3.0])).astype(np.float32)
    valid = np.ones((256,), bool)
    valid[220:] = False
    r = 0.5

    ours = np.asarray(radius_normals(jnp.asarray(pts), jnp.asarray(valid),
                                     r))
    errs = []
    for i in range(220):
        d = np.linalg.norm(pts - pts[i], axis=1)
        nb = pts[(d <= r) & valid].astype(np.float64)
        if len(nb) < 3:
            continue
        _, vecs = np.linalg.eigh(np.cov(nb.T, bias=True))
        ref = vecs[:, 0]
        errs.append(min(np.linalg.norm(ours[i] - ref),
                        np.linalg.norm(ours[i] + ref)))
    assert max(errs) < 5e-2, max(errs)
    assert np.mean(errs) < 2e-3, np.mean(errs)


def test_filter_sweep_matches_separate_passes():
    """_filter_sweep's fused top-k + radius moments == separate knn()
    and radius-moment passes (CPU, exact semantics)."""
    import jax.numpy as jnp

    from deeppointmap_tpu.ops.neighbors import knn
    from deeppointmap_tpu.ops.normals import (filter_sweep,
                                              normals_from_moments,
                                              radius_normals)

    rng = np.random.default_rng(5)
    pts = rng.normal(0, 5, (512, 3)).astype(np.float32)
    valid = np.ones((512,), bool)
    valid[480:] = False
    k, r = 17, 0.8

    idx_f, d2_f, cnt, s, s6 = filter_sweep(
        jnp.asarray(pts), jnp.asarray(valid), k, r, "exact",
        center_chunk=256)
    idx_k, d2_k = knn(jnp.asarray(pts), jnp.asarray(pts), k,
                      jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_k))
    # chunk sizes differ (256 vs knn's 2048): XLA partitions the dot
    # differently, so values match only to f32 reassociation noise
    np.testing.assert_allclose(np.asarray(d2_f), np.asarray(d2_k),
                               rtol=1e-5, atol=1e-4)

    # the radius moments against a direct NumPy radius accumulation
    d_all = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
    w_np = (d_all <= r) & valid[None, :]
    np.testing.assert_allclose(np.asarray(cnt),
                               np.maximum(w_np.sum(1), 1.0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s), w_np @ pts, rtol=2e-4,
                               atol=1e-3)

    # normals agreement needs well-conditioned (planar) neighborhoods:
    # isotropic clusters have ~zero eigengap, where any f32 rounding
    # flips the eigenvector arbitrarily
    plane = np.concatenate([rng.normal(0, 2.0, (512, 2)),
                            rng.normal(0, 0.01, (512, 1))],
                           axis=1).astype(np.float32)
    _, _, cnt, s, s6 = filter_sweep(jnp.asarray(plane),
                                     jnp.asarray(valid), k, r, "exact",
                                     center_chunk=256)
    n_sweep = np.asarray(normals_from_moments(jnp.asarray(plane), cnt, s,
                                              s6))
    n_direct = np.asarray(radius_normals(jnp.asarray(plane),
                                         jnp.asarray(valid), r,
                                         center_chunk=256))
    dots = np.abs(np.sum(n_sweep * n_direct, axis=1))
    # compare only well-populated neighborhoods: a near-empty one sits at
    # the isotropic-fallback threshold, where the two paths' f32 rounding
    # can fall on different sides
    well = np.asarray(cnt) >= 5
    assert np.min(dots[well]) > 1 - 1e-4, np.min(dots[well])


def test_filter_sweep_merged_fast_moments_match_exact(monkeypatch):
    """The TPU fast-grade merged moment accumulation (ONE bf16-mask
    matmul over hi/lo-split features, ops/normals.py filter_sweep) equals
    the exact path's moments: products are exact in f32 (0/1 mask is
    exact bf16; each feature half carries <= 8 mantissa bits), so only
    f32 accumulation order differs. Gate patched so the branch runs on
    CPU; distances stay on the exact path (neighbors._fast unpatched),
    making membership identical."""
    import jax.numpy as jnp

    from deeppointmap_tpu.ops import normals as nm

    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.normal(0, 20.0, (1024, 3)), jnp.float32)
    valid = jnp.asarray(rng.random(1024) > 0.1)
    r = 0.9

    cnt_e, s_e, S6_e = nm.filter_sweep(pts, valid, 0, r, "exact",
                                       center_chunk=256)
    monkeypatch.setattr(nm, "_fast", lambda g: g == "filter")
    cnt_m, s_m, S6_m = nm.filter_sweep(pts, valid, 0, r, "filter",
                                       center_chunk=256)

    np.testing.assert_array_equal(np.asarray(cnt_m), np.asarray(cnt_e))
    np.testing.assert_allclose(np.asarray(s_m), np.asarray(s_e),
                               rtol=1e-6, atol=1e-3)
    np.testing.assert_allclose(np.asarray(S6_m), np.asarray(S6_e),
                               rtol=1e-6, atol=5e-2)


def test_grades_inert_on_cpu():
    """On the CPU backend (the oracle platform), all neighbor-query
    grades produce IDENTICAL results -- 'fast'/'filter' only change
    behavior on TPU, so every oracle test certifies the exact path."""
    import jax.numpy as jnp

    from deeppointmap_tpu.ops.neighbors import hybrid_query, knn

    rng = np.random.default_rng(11)
    pts = rng.normal(0, 5, (256, 3)).astype(np.float32)
    valid = np.ones((256,), bool)
    valid[200:] = False

    base = knn(jnp.asarray(pts), jnp.asarray(pts), 8, jnp.asarray(valid))
    for grade in ("fast", "filter"):
        idx, d2 = knn(jnp.asarray(pts), jnp.asarray(pts), 8,
                      jnp.asarray(valid), grade=grade)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(base[0]))
        np.testing.assert_array_equal(np.asarray(d2), np.asarray(base[1]))
        hq = hybrid_query(jnp.asarray(pts), jnp.asarray(pts), 8, 1.0,
                          jnp.asarray(valid), grade=grade)
        hq0 = hybrid_query(jnp.asarray(pts), jnp.asarray(pts), 8, 1.0,
                           jnp.asarray(valid))
        np.testing.assert_array_equal(np.asarray(hq), np.asarray(hq0))


class TestEncoderQuerier:
    """The reference Querier dispatches knn/ball/hybrid grouping
    (reference: network/encoder/utils.py:18-43); all three are plumbed
    through `encoder.querier`."""

    def _build(self, querier):
        from deeppointmap_tpu.config import Config
        from deeppointmap_tpu.models import Encoder

        args = Config(encoder=dict(
            npoint=[64, 16], radius_list=[[0.1, 0.2], [0.2, 0.4]],
            nsample_list=[[8, 8], [8, 8]], in_channel=3, out_channel=16,
            width=8, expansion=4, upsample_layers=1, norm="LN", bias=True,
            sample=[{"type": "fps"}], querier=querier))
        return Encoder.from_config(args)

    def test_variants_run_and_hybrid_equals_default(self):
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(11)
        pts = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 256, 3)), jnp.float32)
        valid = jnp.ones((1, 256), bool)
        outs = {}
        for q in ("hybrid", "knn", "ball", "hybrid-t3d"):
            enc = self._build(q)
            params = jax.jit(enc.init)(jax.random.PRNGKey(0), pts, valid)
            coor, fea, v = jax.jit(enc.apply)(params, pts, valid)
            assert coor.shape == (1, 64, 3) and fea.shape == (1, 64, 16)
            assert np.isfinite(np.asarray(fea)).all()
            outs[q] = np.asarray(fea)
        # '-t3d' spellings are the reference's CUDA twins of the same op
        np.testing.assert_array_equal(outs["hybrid"], outs["hybrid-t3d"])
        # knn ignores the radius clamp -> different features than hybrid
        assert not np.allclose(outs["hybrid"], outs["knn"])

    def test_unknown_querier_rejected(self):
        with pytest.raises(ValueError, match="querier"):
            self._build("octree")
