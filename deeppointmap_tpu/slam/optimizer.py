"""SE(3) pose-graph optimization: sparse Gauss-Newton / Levenberg-Marquardt.

Replaces the reference's Open3D C++ `GlobalOptimizationLevenbergMarquardt`
backend (reference: system/modules/pose_graph.py:565-658). Host-side NumPy
+ scipy.sparse: SLAM graphs here are hundreds of keyframes, far below the
scale where an on-device solver would pay off, and float64 is free on the
host.

Formulation: minimize  sum_e  r_e^T  Omega_e  r_e   with
    r_e = Log( Z_e^{-1} T_i^{-1} T_j )        (right perturbation)
where Z_e is the measured relative pose (pose_dst in src frame -- the
edge convention of slam/pose_graph.py) and Omega_e the 6x6 information
matrix. Jacobians use the inverse right Jacobian series; tests validate
them against finite differences and the full solver against noisy-loop
synthetic graphs.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from deeppointmap_tpu.utils import se3 as se3m


def _ad(xi: np.ndarray) -> np.ndarray:
    """se(3) adjoint of a twist (rho, phi): [[phi^, rho^], [0, phi^]]."""
    rho, phi = xi[:3], xi[3:]
    A = np.zeros((6, 6))
    P = se3m.hat(phi)
    A[:3, :3] = P
    A[:3, 3:] = se3m.hat(rho)
    A[3:, 3:] = P
    return A


def _jr_inv(xi: np.ndarray) -> np.ndarray:
    """Inverse right Jacobian of SE(3), 2nd-order series:
    Jr^{-1}(xi) ~= I + ad(xi)/2 + ad(xi)^2 / 12 (residuals are small)."""
    A = _ad(xi)
    return np.eye(6) + 0.5 * A + (A @ A) / 12.0


def edge_residual_jacobians(Ti: np.ndarray, Tj: np.ndarray, Z: np.ndarray):
    """Residual r = Log(Z^{-1} Ti^{-1} Tj) and Jacobians wrt right
    perturbations of (Ti, Tj). Returns (r (6,), Ji (6,6), Jj (6,6))."""
    rel = se3m.inv(Ti) @ Tj
    E = se3m.inv(Z) @ rel
    r = se3m.se3_log(E)
    Jri = _jr_inv(r)
    Jj = Jri
    Ji = -Jri @ se3m.adjoint(se3m.inv(rel))
    return r, Ji, Jj


def _graph_cost(poses, edges) -> float:
    c = 0.0
    for i, j, Z, omega, w in edges:
        r = se3m.se3_log(se3m.inv(Z) @ se3m.inv(poses[i]) @ poses[j])
        c += float(w * r @ omega @ r)
    return c


def optimize_pose_graph(
    poses: np.ndarray,                     # (V, 4, 4)
    edges: Sequence[Tuple[int, int, np.ndarray, np.ndarray, float]],
    fixed_idx: int = 0,
    max_iters: int = 50,
    lm_lambda: float = 1e-4,
    rel_tol: float = 1e-8,
) -> np.ndarray:
    """Levenberg-Marquardt over the pose graph. `edges` entries are
    (src_idx, dst_idx, Z (4,4), information (6,6), weight). The pose at
    `fixed_idx` is the gauge anchor. Returns optimized (V, 4, 4)."""
    V = poses.shape[0]
    if V <= 1 or not edges:
        return poses.copy()
    T = [p.copy() for p in poses]
    # symmetrize information (numerical safety; GtG is symmetric already)
    edges = [(i, j, np.asarray(Z, np.float64),
              0.5 * (np.asarray(om, np.float64) + np.asarray(om, np.float64).T),
              float(w)) for i, j, Z, om, w in edges]

    lam = lm_lambda
    cost = _graph_cost(T, edges)
    for _ in range(max_iters):
        rows, cols, vals = [], [], []
        b = np.zeros(6 * V)

        def add_block(r0, c0, M):
            for a in range(6):
                for c in range(6):
                    rows.append(r0 + a)
                    cols.append(c0 + c)
                    vals.append(M[a, c])

        for i, j, Z, omega, w in edges:
            r, Ji, Jj = edge_residual_jacobians(T[i], T[j], Z)
            Wi = w * omega
            add_block(6 * i, 6 * i, Ji.T @ Wi @ Ji)
            add_block(6 * j, 6 * j, Jj.T @ Wi @ Jj)
            add_block(6 * i, 6 * j, Ji.T @ Wi @ Jj)
            add_block(6 * j, 6 * i, Jj.T @ Wi @ Ji)
            b[6 * i:6 * i + 6] += Ji.T @ Wi @ r
            b[6 * j:6 * j + 6] += Jj.T @ Wi @ r

        H = sp.coo_matrix((vals, (rows, cols)), shape=(6 * V, 6 * V)).tocsc()

        # gauge fixing: clamp the anchor block
        anchor = np.arange(6 * fixed_idx, 6 * fixed_idx + 6)
        H = H.tolil()
        H[anchor, :] = 0.0
        H[:, anchor] = 0.0
        for a in anchor:
            H[a, a] = 1.0
        b[anchor] = 0.0
        H = H.tocsc()

        improved = False
        converged = False
        for _try in range(8):
            Hl = H + lam * sp.eye(6 * V, format="csc")
            try:
                dx = spla.spsolve(Hl, -b)
            except Exception:
                lam *= 10.0
                continue
            if not np.all(np.isfinite(dx)):
                lam *= 10.0
                continue
            T_new = [t @ se3m.se3_exp(dx[6 * k:6 * k + 6])
                     for k, t in enumerate(T)]
            new_cost = _graph_cost(T_new, edges)
            if new_cost < cost:
                T = T_new
                improved = True
                lam = max(lam * 0.5, 1e-9)
                converged = (cost - new_cost) <= rel_tol * max(cost, 1e-12)
                cost = new_cost
                break
            lam *= 10.0
        if not improved or converged:
            break
    return np.stack(T, 0)


def load_g2o(path: str):
    """Parse a g2o SE3:QUAT file -> (tokens, poses (V,4,4), edges list).
    Counterpart of PoseGraph.to_g2o_file; also reads files exported by the
    reference (pose_graph.py:821-842)."""
    from scipy.spatial.transform import Rotation

    tokens: List[int] = []
    poses: List[np.ndarray] = []
    raw_edges = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "VERTEX_SE3:QUAT":
                tok = int(parts[1])
                t = np.array([float(x) for x in parts[2:5]])
                q = [float(x) for x in parts[5:9]]
                R = Rotation.from_quat(q).as_matrix()
                tokens.append(tok)
                poses.append(se3m.se3(R, t))
            elif parts[0] == "EDGE_SE3:QUAT":
                s, d = int(parts[1]), int(parts[2])
                t = np.array([float(x) for x in parts[3:6]])
                q = [float(x) for x in parts[6:10]]
                R = Rotation.from_quat(q).as_matrix()
                upper = [float(x) for x in parts[10:31]]
                info = np.zeros((6, 6))
                k = 0
                for r0 in range(6):
                    for c0 in range(r0, 6):
                        info[r0, c0] = upper[k]
                        info[c0, r0] = upper[k]
                        k += 1
                raw_edges.append((s, d, se3m.se3(R, t), info, 1.0))
    tok_to_idx = {t: i for i, t in enumerate(tokens)}
    edges = [(tok_to_idx[s], tok_to_idx[d], Z, info, w)
             for s, d, Z, info, w in raw_edges
             if s in tok_to_idx and d in tok_to_idx]
    return tokens, np.stack(poses, 0), edges
