"""Tests for BoW place recognition and pose-graph relaxation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hslam_tpu.utils import lie


def random_descs(key, n):
    return jax.random.randint(key, (n, 8), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)


class TestBow:
    def test_quantize_and_score(self):
        from hslam_tpu.ops.bow import (
            Vocabulary, bow_vector, l1_score, quantize, train_vocabulary,
        )

        key = jax.random.PRNGKey(0)
        train = np.asarray(random_descs(key, 500))
        voc = train_vocabulary(train, k=4, levels=2, iters=4)
        assert voc.n_words == 16

        descs = random_descs(jax.random.PRNGKey(1), 64)
        words = quantize(voc, descs, jnp.ones(64, bool))
        assert int(words.min()) >= 0 and int(words.max()) < 16

        v1 = bow_vector(words, voc.n_words)
        # identical documents score 1
        np.testing.assert_allclose(float(l1_score(v1, v1[None])[0]), 1.0, atol=1e-5)
        # unrelated random document scores lower
        words2 = quantize(voc, random_descs(jax.random.PRNGKey(7), 64),
                          jnp.ones(64, bool))
        v2 = bow_vector(words2, voc.n_words)
        assert float(l1_score(v1, v2[None])[0]) < 0.95

    def test_idf_weighting_and_save_load(self, tmp_path):
        """tf-idf: a word present in every training document gets idf 0 and
        stops dominating the score (DBoW3 TF_IDF weighting); vocabularies
        round-trip through save/load."""
        from hslam_tpu.ops.bow import (
            bow_vector, load_vocabulary, quantize, save_vocabulary,
            train_vocabulary,
        )

        key = jax.random.PRNGKey(2)
        # 6 documents of 12 descriptors over a 36-word vocabulary, so most
        # words appear in only a few documents; document 0's first
        # descriptor is replicated into every document (a ubiquitous word)
        pool = np.array(random_descs(key, 72))
        for d in range(1, 6):
            pool[d * 12] = pool[0]
        doc_ids = np.repeat(np.arange(6), 12)
        voc = train_vocabulary(pool, k=6, levels=2, iters=4, doc_ids=doc_ids)
        idf = np.asarray(voc.idf)
        assert (idf >= 0).all() and idf.max() > 0
        w_ubiq = int(quantize(voc, jnp.asarray(pool[:1]), jnp.ones(1, bool))[0])
        # the ubiquitous word appears in all 6 docs -> idf == log(6/6) == 0
        np.testing.assert_allclose(idf[w_ubiq], 0.0, atol=1e-6)

        words = quantize(voc, jnp.asarray(pool[:12]), jnp.ones(12, bool))
        v_tfidf = np.asarray(bow_vector(words, voc.n_words, idf=voc.idf))
        assert v_tfidf[w_ubiq] == 0.0
        np.testing.assert_allclose(v_tfidf.sum(), 1.0, atol=1e-5)

        path = str(tmp_path / "voc.npz")
        save_vocabulary(path, voc)
        voc2 = load_vocabulary(path)
        np.testing.assert_array_equal(
            np.asarray(voc.centroids), np.asarray(voc2.centroids))
        np.testing.assert_allclose(np.asarray(voc2.idf), idf)
        assert voc2.n_words == voc.n_words

    def test_similar_images_score_higher(self):
        """Perturbing a few descriptor bits must keep the BoW score high."""
        from hslam_tpu.ops.bow import bow_vector, l1_score, quantize, train_vocabulary

        key = jax.random.PRNGKey(3)
        base = np.asarray(random_descs(key, 400))
        voc = train_vocabulary(base, k=5, levels=2, iters=4)

        descs = random_descs(jax.random.PRNGKey(4), 100)
        # flip one random bit per descriptor
        flips = (jnp.uint32(1) << jax.random.randint(
            jax.random.PRNGKey(5), (100,), 0, 32).astype(jnp.uint32))
        perturbed = descs.at[:, 0].set(jnp.bitwise_xor(descs[:, 0], flips))

        w1 = quantize(voc, descs, jnp.ones(100, bool))
        w2 = quantize(voc, perturbed, jnp.ones(100, bool))
        w3 = quantize(voc, random_descs(jax.random.PRNGKey(6), 100),
                      jnp.ones(100, bool))
        v1 = bow_vector(w1, voc.n_words)
        v2 = bow_vector(w2, voc.n_words)
        v3 = bow_vector(w3, voc.n_words)
        s_sim = float(l1_score(v1, v2[None])[0])
        s_rand = float(l1_score(v1, v3[None])[0])
        assert s_sim > s_rand


class TestPoseGraph:
    def test_loop_correction_reduces_drift(self):
        """A drifted circular trajectory with a perfect loop edge must be
        pulled back toward consistency."""
        from hslam_tpu.models.pose_graph import make_graph, optimize_pose_graph, residuals

        N = 12
        # ground truth: poses on a circle
        angles = np.linspace(0, 2 * np.pi, N, endpoint=False)
        R_gt, t_gt = [], []
        for a in angles:
            xi = jnp.array([np.cos(a), np.sin(a), 0.0, 0.0, 0.0, a])
            R, t = lie.se3_exp(xi)
            R_gt.append(np.asarray(R))
            t_gt.append(np.asarray(t))
        R_gt, t_gt = np.stack(R_gt), np.stack(t_gt)

        # drifted estimates: accumulate noisy odometry
        rng = np.random.RandomState(0)
        R_est = [R_gt[0]]
        t_est = [t_gt[0]]
        for i in range(1, N):
            Ti = np.eye(4)
            Ti[:3, :3], Ti[:3, 3] = R_gt[i], t_gt[i]
            Tp = np.eye(4)
            Tp[:3, :3], Tp[:3, 3] = R_gt[i - 1], t_gt[i - 1]
            Trel = Ti @ np.linalg.inv(Tp)
            noise_xi = jnp.asarray(
                np.concatenate([rng.randn(3) * 0.02, rng.randn(3) * 0.01])
            )
            nR, nt = lie.se3_exp(noise_xi)
            Tn = np.eye(4)
            Tn[:3, :3], Tn[:3, 3] = np.asarray(nR), np.asarray(nt)
            Te = Tn @ Trel
            Tprev = np.eye(4)
            Tprev[:3, :3], Tprev[:3, 3] = R_est[-1], t_est[-1]
            Tcur = Te @ Tprev
            R_est.append(Tcur[:3, :3])
            t_est.append(Tcur[:3, 3])
        R_est, t_est = np.stack(R_est), np.stack(t_est)

        # edges: noisy sequential (the drifted odometry itself) + exact loop 0-(N-1)
        ei, ej, mR, mt, ms = [], [], [], [], []
        for i in range(1, N):
            Ti = np.eye(4)
            Ti[:3, :3], Ti[:3, 3] = R_est[i], t_est[i]
            Tj = np.eye(4)
            Tj[:3, :3], Tj[:3, 3] = R_est[i - 1], t_est[i - 1]
            Trel = Ti @ np.linalg.inv(Tj)
            ei.append(i)
            ej.append(i - 1)
            mR.append(Trel[:3, :3])
            mt.append(Trel[:3, 3])
            ms.append(1.0)
        # ground-truth loop edge between last and first
        Tl = np.eye(4)
        Tl[:3, :3], Tl[:3, 3] = R_gt[N - 1], t_gt[N - 1]
        T0 = np.eye(4)
        T0[:3, :3], T0[:3, 3] = R_gt[0], t_gt[0]
        Trel = Tl @ np.linalg.inv(T0)
        ei.append(N - 1)
        ej.append(0)
        mR.append(Trel[:3, :3])
        mt.append(Trel[:3, 3])
        ms.append(1.0)

        pg = make_graph(
            np.ones(N, np.float32), R_est.astype(np.float32),
            t_est.astype(np.float32), np.ones(N, bool),
            np.asarray(ei), np.asarray(ej),
            (np.asarray(ms, np.float32), np.stack(mR).astype(np.float32),
             np.stack(mt).astype(np.float32)),
            np.concatenate([np.ones(N - 1), [20.0]]).astype(np.float32),
        )

        def loop_gap(R, t):
            """Residual of the loop edge at the current states."""
            Tq = np.eye(4)
            Tq[:3, :3], Tq[:3, 3] = np.asarray(R[N - 1]), np.asarray(t[N - 1])
            T0_ = np.eye(4)
            T0_[:3, :3], T0_[:3, 3] = np.asarray(R[0]), np.asarray(t[0])
            rel = Tq @ np.linalg.inv(T0_)
            err = rel @ np.linalg.inv(Trel)
            return float(np.linalg.norm(np.asarray(
                lie.se3_log(jnp.asarray(err[:3, :3]), jnp.asarray(err[:3, 3]))
            )))

        gap_before = loop_gap(R_est, t_est)
        s_n, R_n, t_n = optimize_pose_graph(pg, n_iters=10, fix_scale=True)
        gap_after = loop_gap(np.asarray(R_n), np.asarray(t_n))
        assert gap_after < 0.3 * gap_before, (gap_before, gap_after)
        # scales pinned
        np.testing.assert_allclose(np.asarray(s_n), 1.0, atol=1e-4)


def _build_circle_sim3(N, scale_drift=1.0002, noise=0.01, seed=0,
                       loop_w=50.0):
    """Strasdat-style fixture: drifted Sim3 odometry around a circle (per-step
    multiplicative scale drift + SE3 noise), sequential edges measured from
    the drifted estimates (self-consistent), one ground-truth loop edge with
    scale 1 between the last and first node."""
    from hslam_tpu.models.pose_graph import make_graph
    from scipy.spatial.transform import Rotation as Rot

    rng = np.random.RandomState(seed)
    angles = np.linspace(0, 2 * np.pi, N, endpoint=False)
    R_gt = Rot.from_rotvec(
        np.stack([np.zeros(N), np.zeros(N), angles], 1)).as_matrix()
    t_gt = np.stack([3 * np.cos(angles), 3 * np.sin(angles), np.zeros(N)], 1)
    s_est = np.empty(N)
    R_est = np.empty((N, 3, 3))
    t_est = np.empty((N, 3))
    s_est[0], R_est[0], t_est[0] = 1.0, R_gt[0], t_gt[0]
    nR_all = Rot.from_rotvec(rng.randn(N, 3) * noise).as_matrix()
    nt_all = rng.randn(N, 3) * noise * 0.5
    for i in range(1, N):
        Rrel = R_gt[i] @ R_gt[i - 1].T
        trel = t_gt[i] - Rrel @ t_gt[i - 1]
        Rr = nR_all[i] @ Rrel
        tr = scale_drift * (nR_all[i] @ trel) + nt_all[i]
        s_est[i] = s_est[i - 1] * scale_drift
        R_est[i] = Rr @ R_est[i - 1]
        t_est[i] = scale_drift * (Rr @ t_est[i - 1]) + tr
    s_est = s_est.astype(np.float32)
    R_est = R_est.astype(np.float32)
    t_est = t_est.astype(np.float32)

    i_idx, j_idx = np.arange(1, N), np.arange(0, N - 1)
    si, Ri, ti = lie.sim3_inverse(
        jnp.asarray(s_est[j_idx]), jnp.asarray(R_est[j_idx]),
        jnp.asarray(t_est[j_idx]))
    sij, Rij, tij = lie.sim3_mul(
        jnp.asarray(s_est[i_idx]), jnp.asarray(R_est[i_idx]),
        jnp.asarray(t_est[i_idx]), si, Ri, ti)
    Rl = R_gt[N - 1] @ R_gt[0].T
    tl = t_gt[N - 1] - Rl @ t_gt[0]
    ei = np.concatenate([i_idx, [N - 1]])
    ej = np.concatenate([j_idx, [0]])
    ms = np.concatenate([np.asarray(sij), [1.0]]).astype(np.float32)
    mR = np.concatenate([np.asarray(Rij), Rl[None]]).astype(np.float32)
    mt = np.concatenate([np.asarray(tij), tl[None]]).astype(np.float32)
    w = np.concatenate([np.ones(N - 1), [loop_w]]).astype(np.float32)
    return make_graph(s_est, R_est, t_est, np.ones(N, bool), ei, ej,
                      (ms, mR, mt), w)


def _pg_chi2(pg, s, R, t):
    from hslam_tpu.models.pose_graph import residuals
    pg2 = pg._replace(s=jnp.asarray(s), R=jnp.asarray(R), t=jnp.asarray(t))
    r = residuals(pg2, jnp.zeros((pg.s.shape[0], 7)))
    return float(jnp.sum(r * r * pg.weight[:, None]))


class TestSparsePoseGraph:
    """The matrix-free PCG path (optimize_pose_graph_pcg) — KITTI-length
    graphs, north-star config #5. Never materializes J (7E x 7N) or
    H (7N x 7N); per-GN-iteration work/memory is O(E)."""

    def test_pcg_matches_dense(self):
        from hslam_tpu.models.pose_graph import (
            optimize_pose_graph, optimize_pose_graph_pcg)

        pg = _build_circle_sim3(40)
        c0 = _pg_chi2(pg, pg.s, pg.R, pg.t)
        sd, Rd, td = optimize_pose_graph(pg, n_iters=10)
        sp, Rp, tp = optimize_pose_graph_pcg(pg, n_iters=10, cg_iters=600)
        cd = _pg_chi2(pg, sd, Rd, td)
        cp = _pg_chi2(pg, sp, Rp, tp)
        assert cd < 1e-2 * c0 and cp < 1e-2 * c0
        # per-node sim3 state agreement between the two solvers
        si, Ri, ti = lie.sim3_inverse(
            jnp.asarray(sp), jnp.asarray(Rp), jnp.asarray(tp))
        se, Re, te = lie.sim3_mul(
            jnp.asarray(sd), jnp.asarray(Rd), jnp.asarray(td), si, Ri, ti)
        d = np.asarray(lie.sim3_log(se, Re, te))
        assert np.abs(d).max() < 5e-3, np.abs(d).max()

    def test_pcg_fix_scale_pins_sigma(self):
        from hslam_tpu.models.pose_graph import optimize_pose_graph_pcg

        pg = _build_circle_sim3(30, scale_drift=1.0)
        s_n, R_n, t_n = optimize_pose_graph_pcg(
            pg, n_iters=8, cg_iters=400, fix_scale=True)
        np.testing.assert_allclose(np.asarray(s_n), 1.0, atol=1e-4)
        assert _pg_chi2(pg, s_n, R_n, t_n) < 0.1 * _pg_chi2(
            pg, pg.s, pg.R, pg.t)

    @pytest.mark.slow
    def test_pcg_10k_nodes_bounded_memory(self):
        """10,000-keyframe Sim3 graph with 1.65x accumulated scale drift: the
        dense path would need a 70k x 70k Hessian (~19 GB) — the PCG path
        relaxes it in O(E) memory (per-edge blocks: ~4 MB) and corrects the
        loop."""
        from hslam_tpu.models.pose_graph import optimize_pose_graph_pcg

        N = 10_000
        pg = _build_circle_sim3(N, scale_drift=1.00005, noise=0.002)
        c0 = _pg_chi2(pg, pg.s, pg.R, pg.t)
        assert float(pg.s[-1]) > 1.5   # real accumulated scale drift
        sp, Rp, tp = optimize_pose_graph_pcg(pg, n_iters=5, cg_iters=1000)
        cp = _pg_chi2(pg, sp, Rp, tp)
        assert cp < 1e-3 * c0, (c0, cp)
        assert np.isfinite(np.asarray(tp)).all()


class TestLoopCloserEndToEnd:
    def test_detect_and_correct_drifted_loop(self):
        """Keyframes around a loop with drifted pose estimates: the closer
        must match the revisit against the start and pull the drifted poses
        back toward consistency."""
        import jax
        import jax.numpy as jnp
        from hslam_tpu.models.loop_closure import LoopCloser
        from hslam_tpu.ops import bow as bow_ops
        from hslam_tpu.ops import orb as orb_ops
        from hslam_tpu.ops.pyramid import gaussian_blur7
        from hslam_tpu.utils.interp import bilinear

        H, W = 96, 128
        fx = fy = 80.0
        cx, cy = W / 2 - 0.5, H / 2 - 0.5
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        depth = 2.0

        key = jax.random.PRNGKey(3)
        ky, kx = jax.random.uniform(key, (2, 8), minval=0.5, maxval=6.5)
        ph = jax.random.uniform(jax.random.fold_in(key, 1), (8,)) * 6.28
        amps = jnp.array([35.0, 30.0, 22.0, 18.0, 14.0, 10.0, 8.0, 6.0])
        ys, xs = jnp.mgrid[0:H, 0:W]
        I0 = 120.0 + sum(
            amps[i] * jnp.sin(2 * jnp.pi * (kx[i] * xs / W + ky[i] * ys / H) + ph[i])
            for i in range(8)
        )
        I0 = I0.astype(jnp.float32)

        def render(Rf, tf):
            px = (xs - cx) / fx
            py = (ys - cy) / fy
            Rinv, tinv = lie.se3_inverse(Rf, tf)
            dz = Rinv[2, 0] * px + Rinv[2, 1] * py + Rinv[2, 2]
            s = (depth - tinv[2]) / dz
            X = s * (Rinv[0, 0] * px + Rinv[0, 1] * py + Rinv[0, 2]) + tinv[0]
            Y = s * (Rinv[1, 0] * px + Rinv[1, 1] * py + Rinv[1, 2]) + tinv[1]
            return bilinear(I0, fx * X / depth + cx, fy * Y / depth + cy)

        # a loop: out along +x and back; last pose == first pose (GT)
        n_kf = 20
        gt = []
        for i in range(n_kf):
            a = 2 * np.pi * i / n_kf
            xi = jnp.array([0.35 * np.sin(a), 0.12 * (1 - np.cos(a)), 0.0,
                            0.0, 0.0, 0.0])
            R, t = lie.se3_exp(xi)
            gt.append((np.asarray(R), np.asarray(t)))

        # drifted estimates: small rotation/translation bias per step
        drift_R, drift_t = lie.se3_exp(jnp.array([0.01, -0.006, 0.004,
                                                  0.002, 0.003, -0.002]))
        est = [np.eye(4)]
        for i in range(1, n_kf):
            Ti = np.eye(4)
            Ti[:3, :3], Ti[:3, 3] = gt[i]
            Tp = np.eye(4)
            Tp[:3, :3], Tp[:3, 3] = gt[i - 1]
            Trel = Ti @ np.linalg.inv(Tp)
            Dn = np.eye(4)
            Dn[:3, :3], Dn[:3, 3] = np.asarray(drift_R), np.asarray(drift_t)
            est.append(Dn @ Trel @ est[-1])

        # train a vocab on features from a few frames
        descs = []
        frames = []
        feats = []
        for i in range(n_kf):
            R, t = gt[i]
            img = render(jnp.asarray(R), jnp.asarray(t))
            frames.append(img)
            score = orb_ops.fast_score(img, 8.0)
            u, v, valid = orb_ops.grid_nms(score, 8, 256)
            ang = orb_ops.ic_angle(img, u, v)
            d = orb_ops.rbrief(gaussian_blur7(img), u, v, ang)
            feats.append((u, v, valid, d))
            if i < 6:
                descs.append(np.asarray(d)[np.asarray(valid)])
        voc = bow_ops.train_vocabulary(np.concatenate(descs), k=6, levels=2,
                                       iters=4)

        closer = LoopCloser(voc, min_gap=10, min_inliers=20)
        for i in range(n_kf):
            u, v, valid, d = feats[i]
            # analytic keypoint depths: rays hitting the plane z_world = 2
            R, t = gt[i]
            Rinv, tinv = R.T, -R.T @ np.asarray(t)
            dirs = np.stack([(np.asarray(u) - cx) / fx,
                             (np.asarray(v) - cy) / fy,
                             np.ones_like(np.asarray(u))], -1)
            dz = dirs @ Rinv.T[:, 2]
            zc = (depth - tinv[2]) / np.maximum(dz, 1e-6)
            kp_idepth = 1.0 / np.maximum(zc, 1e-3)
            # entries store camToWorld of the DRIFTED estimate
            closer.add_keyframe(i, i, d, u, v, valid,
                               np.linalg.inv(est[i]),
                               kp_idepth=kp_idepth,
                               kp_depth_ok=np.asarray(valid))

        Kj = np.asarray(K)
        loop = closer.detect(n_kf - 1, Kj)
        assert loop is not None, "no loop detected on revisit"
        assert abs(loop.match_kf - (n_kf - 1)) >= 10

        # gap between last and its match before/after correction
        def gap():
            Ta = closer.entries[n_kf - 1].cam_to_world
            Tb = closer.entries[0].cam_to_world
            # GT relative pose last->first
            Tg_a = np.linalg.inv(np.block([[gt[n_kf-1][0], gt[n_kf-1][1][:, None]], [np.zeros((1, 3)), np.ones((1, 1))]]))
            Tg_b = np.linalg.inv(np.block([[gt[0][0], gt[0][1][:, None]], [np.zeros((1, 3)), np.ones((1, 1))]]))
            rel_est = np.linalg.inv(Ta) @ Tb
            rel_gt = np.linalg.inv(Tg_a) @ Tg_b
            err = rel_est @ np.linalg.inv(rel_gt)
            import jax.numpy as jnp2
            return float(np.linalg.norm(np.asarray(
                lie.se3_log(jnp2.asarray(err[:3, :3]), jnp2.asarray(err[:3, 3])))))

        g_before = gap()
        closer.correct(loop, fix_scale=True)
        g_after = gap()
        assert g_after < 0.6 * g_before, (g_before, g_after)


def test_loop_correct_sharded_pcg_path():
    """LoopCloser.correct with a dist_mesh dispatches the edge-sharded PCG
    relaxation past dense_max_nodes and matches the dense answer from the
    same drifted chain (the multi-chip loop-closure backend wiring)."""
    from jax.sharding import Mesh
    from hslam_tpu.models.loop_closure import (KeyframeEntry, LoopCloser,
                                               LoopResult)

    def build_closer(mesh, dense_max):
        c = LoopCloser.__new__(LoopCloser)   # vocab-free: correct() only
        c.entries = []
        c.dist_mesh = mesh
        c.dense_max_nodes = dense_max
        rng = np.random.RandomState(4)
        T = np.eye(4)
        for i in range(24):
            # drifted forward motion with small rotation noise
            step = np.eye(4)
            step[:3, 3] = [0.1 + 0.004 * i, 0.0, 0.01]
            ang = rng.randn(3) * 0.01
            step[:3, :3] = np.asarray(lie.se3_exp(
                jnp.asarray(np.r_[np.zeros(3), ang], jnp.float32))[0])
            T = step @ T
            c.entries.append(KeyframeEntry(
                kf_id=i, shell_id=i, bow=np.zeros(4), desc=np.zeros((1, 8)),
                kp_u=np.zeros(1), kp_v=np.zeros(1), valid=np.zeros(1, bool),
                cam_to_world=np.linalg.inv(T)))
        return c

    loop = LoopResult(query_kf=23, match_kf=0,
                      rel_R=np.eye(3), rel_t=np.array([2.0, 0.0, 0.2]),
                      rel_s=1.0, n_inliers=60)

    dense = build_closer(None, 512)
    dense.correct(loop, fix_scale=True)
    mesh = Mesh(np.array(jax.devices()[:8]), ("edges",))
    sharded = build_closer(mesh, 4)          # force the PCG branch
    sharded.correct(loop, fix_scale=True)

    for a, b in zip(dense.entries, sharded.entries):
        np.testing.assert_allclose(b.cam_to_world, a.cam_to_world,
                                   rtol=0, atol=2e-3)


def test_correct_bounded_compiles_over_growing_graph():
    """loop_closure.correct pads graphs to power-of-two buckets so a whole
    run compiles ~log2(N) pose-graph executables, not one per keyframe
    count (round-3 weakness: ~50 distinct XLA compiles in the 500-frame
    test, each a latency spike + a >1s cache write)."""
    from hslam_tpu.models import pose_graph as pg_mod
    from hslam_tpu.models.loop_closure import (KeyframeEntry, LoopCloser,
                                               LoopResult)

    def entry(i, T):
        return KeyframeEntry(
            kf_id=i, shell_id=i, bow=np.zeros(4), desc=np.zeros((1, 8)),
            kp_u=np.zeros(1), kp_v=np.zeros(1), valid=np.zeros(1, bool),
            cam_to_world=np.linalg.inv(T))

    c = LoopCloser.__new__(LoopCloser)   # vocab-free: correct() only
    c.entries = []
    c.dist_mesh = None
    c.dense_max_nodes = 512
    T = np.eye(4)
    before = pg_mod.optimize_pose_graph._cache_size()
    n_corr = 0
    for i in range(40):
        step = np.eye(4)
        step[:3, 3] = [0.1, 0.0, 0.01]
        T = step @ T
        c.entries.append(entry(i, T))
        if i >= 16 and i % 3 == 0:
            # a correction on every growing graph size
            loop = LoopResult(query_kf=i, match_kf=0, rel_R=np.eye(3),
                              rel_t=T[:3, 3].copy(), rel_s=1.0, n_inliers=40)
            out = c.correct(loop, fix_scale=True)
            n_corr += 1
            assert len(out) == len(c.entries)
            assert all(np.isfinite(p).all() for _, p in out)
    added = pg_mod.optimize_pose_graph._cache_size() - before
    assert n_corr >= 8
    # N grows 17..40 -> buckets {32, 64}: at most 2 fresh executables
    assert added <= 2, f"{added} pose-graph compiles for {n_corr} corrections"


def test_shipped_vocabulary_recall_on_disjoint_scenes():
    """The SHIPPED 10^4-word vocabulary (hslam_tpu/assets/vocab_10k.npz,
    default-loaded by SLAMSystem — the reference's mandatory vocabulary
    argument, Main.h:81) must give revisit recall on scenes DISJOINT from
    its training imagery: a warped revisit of scene A scores well above a
    different scene B. Compared against an online-style vocabulary trained
    on unrelated imagery (what online training yields when the run starts
    somewhere else)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from train_vocab import diverse_scene_images

    from hslam_tpu.models.system import default_vocab_path
    from hslam_tpu.ops import bow as bow_ops
    from hslam_tpu.ops import features as ft

    vp = default_vocab_path()
    assert vp is not None, "shipped vocabulary missing"
    voc = bow_ops.load_vocabulary(vp)
    assert voc.n_words >= 10_000

    # scenes from a seed disjoint from training (training used seed 0)
    imgs = {}
    for s, img in diverse_scene_images(3, 2, seed=12345):
        imgs.setdefault(s, []).append(img)

    def bow_of(vocab, img):
        u, v, lvl, sc, desc, valid = ft.extract_multiscale(
            jnp.asarray(img, jnp.float32), 4, 512, 10.0)
        words = bow_ops.quantize(vocab, desc, valid)
        return bow_ops.bow_vector(words, vocab.n_words, idf=vocab.idf)

    vA0 = bow_of(voc, imgs[0][0])     # scene A
    vA1 = bow_of(voc, imgs[0][1])     # warped/relit revisit of A
    vB = bow_of(voc, imgs[1][0])      # different scene B
    vC = bow_of(voc, imgs[2][0])      # different scene C
    s_AA = float(bow_ops.l1_score(vA0, vA1[None])[0])
    s_AB = float(bow_ops.l1_score(vA0, vB[None])[0])
    s_AC = float(bow_ops.l1_score(vA0, vC[None])[0])
    assert s_AA > 2.0 * max(s_AB, s_AC, 1e-3), (
        f"offline vocab failed revisit ranking: AA={s_AA:.3f} "
        f"AB={s_AB:.3f} AC={s_AC:.3f}")

    # online-style vocab trained on UNRELATED imagery (scene C only)
    u, v, lvl, sc, dC, valC = ft.extract_multiscale(
        jnp.asarray(imgs[2][0], jnp.float32), 4, 512, 10.0)
    pool = np.asarray(dC)[np.asarray(valC)]
    voc_on = bow_ops.train_vocabulary(pool, k=8, levels=3, iters=3)
    oAA = float(bow_ops.l1_score(bow_of(voc_on, imgs[0][0]),
                                 bow_of(voc_on, imgs[0][1])[None])[0])
    oAB = float(bow_ops.l1_score(bow_of(voc_on, imgs[0][0]),
                                 bow_of(voc_on, imgs[1][0])[None])[0])
    # offline must discriminate at least as well as the mistrained online
    # vocab (margin = revisit score minus impostor score)
    assert (s_AA - s_AB) >= (oAA - oAB) - 1e-3, (
        f"offline margin {s_AA - s_AB:.3f} < online margin "
        f"{oAA - oAB:.3f}")
