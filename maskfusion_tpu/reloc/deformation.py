"""Embedded deformation graph (Sumner-style) for map non-rigid correction.

Re-implementation of Core/Utils/DeformationGraph.{h,cpp} + Core/Model/
Deformation.{h,cpp} + CholeskyDecomp: graph nodes sampled from the surfel
map, Gauss-Newton over per-node affine transforms with rotation /
regularisation / constraint energies (weights wRot=1, wReg=10, wCon=100 —
DeformationGraph.cpp:25-27), solved by sparse normal equations (the
reference uses CHOLMOD; we use scipy's sparse Cholesky-backed spsolve).
Application blends the k=4 nearest nodes per point exactly like
copy_unstable.vert:161-341 does in the clean shader.

Host-side by design: the graph is tiny (<=1024 nodes) and solves are sparse;
the dense application to millions of surfels is vectorised numpy (or can be
pushed through jnp unchanged).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
from scipy import sparse
from scipy.sparse.linalg import spsolve

W_ROT = 1.0
W_REG = 10.0
W_CON = 100.0
K_NEIGHBOURS = 4


@dataclasses.dataclass
class GraphConstraint:
    src: np.ndarray          # (3,) point in map (world) coordinates
    dst: np.ndarray          # (3,) where it should move to
    relative: bool = False
    src_time: int = 0
    dst_time: int = 0


class DeformationGraph:
    def __init__(self, nodes: np.ndarray, node_times: Optional[np.ndarray] = None):
        """nodes: (G, 3) world positions (sampled from the map)."""
        self.g = nodes.astype(np.float64)
        self.n = len(nodes)
        self.times = (node_times if node_times is not None
                      else np.arange(self.n)).astype(np.float64)
        self.A = np.tile(np.eye(3), (self.n, 1, 1))    # per-node affine
        self.t = np.zeros((self.n, 3))
        # k-NN connectivity (reference: sequential in time order;
        # we use metric kNN which is strictly better for loop closures)
        d2 = np.sum((self.g[:, None] - self.g[None]) ** 2, -1)
        np.fill_diagonal(d2, np.inf)
        k = min(K_NEIGHBOURS, self.n - 1)
        self.neighbours = np.argsort(d2, axis=1)[:, :k]   # (G, k)
        self.constraints: List[GraphConstraint] = []

    @classmethod
    def sample_from_map(cls, positions: np.ndarray, init_times: np.ndarray,
                        max_nodes: int = 256) -> "DeformationGraph":
        """Systematic sampling in map order (Deformation::sampleGraphModel,
        Deformation.cpp:207-276 — bufferSize 1024 nodes)."""
        order = np.argsort(init_times)
        step = max(1, len(positions) // max_nodes)
        idx = order[::step][:max_nodes]
        return cls(positions[idx], init_times[idx])

    def add_constraint(self, src: np.ndarray, dst: np.ndarray,
                       src_time: int = 0, dst_time: int = 0,
                       relative: bool = False):
        self.constraints.append(GraphConstraint(
            np.asarray(src, np.float64), np.asarray(dst, np.float64),
            relative, src_time, dst_time))

    # ----------------------------------------------------------- weights
    def _knn_weights(self, pts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(P, k) node ids + normalised blend weights per point
        (copy_unstable.vert's k=4 (1 - d/dmax)^2 scheme)."""
        d2 = ((pts[:, None, :] - self.g[None, :, :]) ** 2).sum(-1)
        k = min(K_NEIGHBOURS, self.n)
        ids = np.argsort(d2, axis=1)[:, :k]
        d = np.sqrt(np.take_along_axis(d2, ids, 1))
        dmax = d[:, -1:] * 1.0001 + 1e-12
        w = (1.0 - d / dmax) ** 2
        w = w / np.maximum(w.sum(1, keepdims=True), 1e-12)
        return ids, w

    # ---------------------------------------------------------- optimise
    def optimise(self, iterations: int = 3) -> Tuple[float, float]:
        """Gauss-Newton over (A, t).  Returns (total_error, mean_cons_error)
        — the acceptance pair used by Deformation::constrain
        (Deformation.cpp:75-180: accept if meanConsError < 0.0003 and
        error < 0.12)."""
        if not self.constraints:
            return 0.0, 0.0
        cons_src = np.stack([c.src for c in self.constraints])
        cons_dst = np.stack([c.dst for c in self.constraints])
        cids, cw = self._knn_weights(cons_src)

        nvar = self.n * 12

        def pack_index(node, comp):
            return node * 12 + comp

        for _ in range(iterations):
            rows, cols, vals, resid = [], [], [], []
            r = 0

            def add(row, col, val):
                rows.append(row)
                cols.append(col)
                vals.append(val)

            sq_rot = np.sqrt(W_ROT)
            for i in range(self.n):
                Ai = self.A[i]
                pairs = [(0, 1), (0, 2), (1, 2)]
                for (a, b) in pairs:
                    resid.append(sq_rot * float(Ai[:, a] @ Ai[:, b]))
                    for c in range(3):
                        add(r, pack_index(i, c * 3 + a), sq_rot * Ai[c, b])
                        add(r, pack_index(i, c * 3 + b), sq_rot * Ai[c, a])
                    r += 1
                for a in range(3):
                    resid.append(sq_rot * float(Ai[:, a] @ Ai[:, a] - 1.0))
                    for c in range(3):
                        add(r, pack_index(i, c * 3 + a), 2 * sq_rot * Ai[c, a])
                    r += 1

            sq_reg = np.sqrt(W_REG)
            for i in range(self.n):
                for j in self.neighbours[i]:
                    e = self.g[j] - self.g[i]
                    pred = self.A[i] @ e + self.g[i] + self.t[i] - (
                        self.g[j] + self.t[j])
                    for c in range(3):
                        resid.append(sq_reg * float(pred[c]))
                        for d in range(3):
                            add(r, pack_index(i, c * 3 + d), sq_reg * e[d])
                        add(r, pack_index(i, 9 + c), sq_reg)
                        add(r, pack_index(int(j), 9 + c), -sq_reg)
                        r += 1

            sq_con = np.sqrt(W_CON)
            for ci in range(len(self.constraints)):
                p = cons_src[ci]
                pred = np.zeros(3)
                for kk in range(cids.shape[1]):
                    ni = int(cids[ci, kk])
                    wgt = cw[ci, kk]
                    pred += wgt * (self.A[ni] @ (p - self.g[ni])
                                   + self.g[ni] + self.t[ni])
                err = pred - cons_dst[ci]
                for c in range(3):
                    resid.append(sq_con * float(err[c]))
                    for kk in range(cids.shape[1]):
                        ni = int(cids[ci, kk])
                        wgt = cw[ci, kk]
                        e = p - self.g[ni]
                        for d in range(3):
                            add(r, pack_index(ni, c * 3 + d),
                                sq_con * wgt * e[d])
                        add(r, pack_index(ni, 9 + c), sq_con * wgt)
                    r += 1

            J = sparse.csr_matrix(
                (vals, (rows, cols)), shape=(r, nvar))
            b = -np.asarray(resid)
            JtJ = (J.T @ J + 1e-8 * sparse.eye(nvar)).tocsc()
            dx = spsolve(JtJ, J.T @ b)
            dx = dx.reshape(self.n, 12)
            self.A += dx[:, :9].reshape(self.n, 3, 3)
            self.t += dx[:, 9:]

        # final errors
        phi = self.apply_to_points(cons_src)
        cons_err = np.linalg.norm(phi - cons_dst, axis=1)
        mean_cons = float(cons_err.mean())
        total = float(np.sqrt(np.mean(cons_err ** 2)))
        return total, mean_cons

    # ------------------------------------------------------------- apply
    def apply_to_points(self, pts: np.ndarray,
                        normals: Optional[np.ndarray] = None):
        ids, w = self._knn_weights(pts)
        out = np.zeros_like(pts, dtype=np.float64)
        nout = np.zeros_like(pts, dtype=np.float64) if normals is not None else None
        for kk in range(ids.shape[1]):
            ni = ids[:, kk]
            wgt = w[:, kk:kk + 1]
            d = pts - self.g[ni]
            out += wgt * (np.einsum("nij,nj->ni", self.A[ni], d)
                          + self.g[ni] + self.t[ni])
            if normals is not None:
                inv_t = np.linalg.inv(np.transpose(self.A[ni], (0, 2, 1)))
                nout += wgt * np.einsum("nij,nj->ni", inv_t, normals)
        if normals is not None:
            nout /= np.maximum(np.linalg.norm(nout, axis=1, keepdims=True),
                               1e-12)
            return out, nout
        return out

    def apply_to_pose(self, pose: np.ndarray) -> np.ndarray:
        """Deform a camera pose by moving its position and re-orthonormalised
        rotation (the reference applies the graph to fern poses,
        DeformationGraph.cpp applyGraphToPoses)."""
        p = pose[:3, 3][None]
        ids, w = self._knn_weights(p)
        blended_A = np.einsum("k,kij->ij",
                              w[0], self.A[ids[0]])
        new_t = self.apply_to_points(p)[0]
        R = blended_A @ pose[:3, :3]
        u, _, vt = np.linalg.svd(R)
        out = pose.copy()
        out[:3, :3] = u @ vt
        out[:3, 3] = new_t
        return out
