"""LOPQ (Locally Optimized Product Quantization) models, TPU-native.

Same public surface as the reference's vendored lopq package
(reference: lopq/lopq/model.py — ``train``, ``LOPQModel``, ``LOPQModelPCA``,
``LOPQCode``), re-designed for JAX/XLA:

- training replaces per-point Python loops and sklearn MiniBatchKMeans with
  batched MXU matmuls, ``segment_sum`` scatters and one batched ``eigh``
  (see ops/kmeans.py, ops/rotations.py, ops/pca.py);
- encoding is vectorized: ``predict_batch`` codes N points at once on device,
  while scalar ``predict`` keeps the reference's single-vector contract
  (tuples + size-fitted uint dtypes) for drop-in compatibility.

Parameter layout matches the reference exactly: ``Cs`` is a pair of [V, D/2]
coarse codebooks, ``Rs`` a pair of [V, D/2, D/2] rotation stacks applied as
``R @ r``, ``mus`` a pair of [V, D/2] mean residuals, ``subquantizers`` a pair
of length-M/2 lists of [S, D/M] codebooks.
"""

from collections import namedtuple

import jax.numpy as jnp
import numpy as np

from columbiaimagesearch_tpu.ops.kmeans import assign_clusters, fit_kmeans_auto
from columbiaimagesearch_tpu.ops.pca import train_pca
from columbiaimagesearch_tpu.ops.rotations import (
    compute_local_rotations,
    compute_residuals,
    project_residuals_to_local,
)
from columbiaimagesearch_tpu.utils.codes import code_dtype_for

LOPQCode = namedtuple("LOPQCode", ["coarse", "fine"])


def _derive_seed(random_state, salt: int):
    if random_state is None:
        return None
    return (int(random_state) + salt) % (2**31 - 1)


def train(
    data,
    V: int = 8,
    M: int = 4,
    subquantizer_clusters: int = 256,
    parameters=None,
    kmeans_coarse_iters: int = 10,
    kmeans_local_iters: int = 20,
    n_init: int = 10,
    subquantizer_sample_ratio: float = 1.0,
    random_state=None,
    verbose: bool = False,
):
    """Fit an LOPQ model; mirrors the reference train flow
    (lopq/lopq/model.py:339-437): coarse k-means per half, local rotations per
    coarse cluster, subquantizer k-means over locally projected residuals,
    reusing any parameters provided.

    :returns: ((C1, C2), (Rs1, Rs2), (mu1, mu2), (subs1, subs2)) numpy arrays
    """
    del verbose  # stage logging is handled by callers
    data = np.asarray(data, dtype=np.float32)

    Cs = Rs = mus = subquantizers = None
    if parameters is not None:
        Cs, Rs, mus, subquantizers = parameters
    if Rs is None or mus is None:
        Rs = mus = None

    first_half, second_half = np.split(data, 2, axis=1)

    if Cs is not None:
        C1, C2 = Cs
    else:
        C1 = np.asarray(
            fit_kmeans_auto(first_half, V, kmeans_coarse_iters, n_init,
                            seed=_derive_seed(random_state, 0)))
        C2 = np.asarray(
            fit_kmeans_auto(second_half, V, kmeans_coarse_iters, n_init,
                            seed=_derive_seed(random_state, 1)))

    # From here the intermediates (rotations, residuals, projections) stay
    # DEVICE-resident through subquantizer training — at the 1M / V=4096
    # config, each host round trip of a residual/projection matrix costs
    # ~45 s through the dev relay (~33 MB/s D2H) and the permuted eigvec
    # matrices another ~70 s; everything host-side was pure transfer, not
    # compute (scripts/profile_rotations.py). The single host copy happens
    # when LOPQModel.__init__ materializes the returned parameters.
    if Rs is not None and mus is not None:
        Rs1, Rs2 = Rs
        mu1, mu2 = mus
        assignments1 = assignments2 = residuals1 = residuals2 = None
    else:
        Rs1, mu1, assignments1, residuals1 = compute_local_rotations(
            first_half, C1, M // 2)
        Rs2, mu2, assignments2, residuals2 = compute_local_rotations(
            second_half, C2, M // 2)

    # Subsample for subquantizer training; same RNG construction as the
    # reference (np.random.RandomState(random_state).choice, model.py:414) so
    # matched seeds select identical rows.
    subquantizer_sample_ratio = min(subquantizer_sample_ratio, 1.0)
    N = data.shape[0]
    N2 = int(np.floor(subquantizer_sample_ratio * N))
    sample_inds = np.random.RandomState(random_state).choice(N, N2, False)

    import jax.numpy as jnp

    si = jnp.asarray(sample_inds.astype(np.int32))
    if assignments1 is not None:
        residuals1 = jnp.asarray(residuals1)[si]
        residuals2 = jnp.asarray(residuals2)[si]
        assignments1 = jnp.asarray(assignments1)[si]
        assignments2 = jnp.asarray(assignments2)[si]
    else:
        residuals1, assignments1 = compute_residuals(
            first_half[sample_inds], C1)
        residuals2, assignments2 = compute_residuals(
            second_half[sample_inds], C2)

    projected1 = project_residuals_to_local(residuals1, assignments1, Rs1,
                                            mu1)
    projected2 = project_residuals_to_local(residuals2, assignments2, Rs2,
                                            mu2)

    def _train_subs(projected, salt):
        subs = []
        width = projected.shape[1] // (M // 2)
        for i in range(M // 2):
            d = projected[:, i * width:(i + 1) * width]
            C = fit_kmeans_auto(d, subquantizer_clusters, kmeans_local_iters,
                                n_init,
                                seed=_derive_seed(random_state, salt + 10 * i))
            subs.append(np.asarray(C))
        return subs

    subquantizers1 = _train_subs(projected1, 100)
    subquantizers2 = _train_subs(projected2, 200)

    return (C1, C2), (Rs1, Rs2), (mu1, mu2), (subquantizers1, subquantizers2)


class LOPQModel(object):
    """LOPQ model with the reference's public surface, batched on TPU."""

    def __init__(self, V=8, M=4, subquantizer_clusters=256, parameters=None):
        self.Cs, self.Rs, self.mus, self.subquantizers = (
            parameters if parameters is not None else (None, None, None, None))

        if self.Cs is not None:
            self.Cs = tuple(np.asarray(C, dtype=np.float32) for C in self.Cs)
            self.V = self.Cs[0].shape[0]
            self.num_coarse_splits = len(self.Cs)
        else:
            self.V = V
            self.num_coarse_splits = 2

        if self.Rs is not None:
            self.Rs = tuple(np.asarray(R, dtype=np.float32) for R in self.Rs)
        if self.mus is not None:
            self.mus = tuple(np.asarray(m, dtype=np.float32) for m in self.mus)

        if self.subquantizers is not None:
            self.subquantizers = tuple(
                [np.asarray(s, dtype=np.float32) for s in split]
                for split in self.subquantizers)
            self.num_fine_splits = len(self.subquantizers[0])
            self.M = self.num_fine_splits * self.num_coarse_splits
            self.subquantizer_clusters = self.subquantizers[0][0].shape[0]
        else:
            self.num_fine_splits = M // 2
            self.M = M
            self.subquantizer_clusters = subquantizer_clusters

    # ------------------------------------------------------------------ train

    def fit(self, data, kmeans_coarse_iters=10, kmeans_local_iters=20, n_init=10,
            subquantizer_sample_ratio=1.0, random_state=None, verbose=False):
        """Train missing parameters (existing ones are reused), like the
        reference (lopq/lopq/model.py:495-520)."""
        existing = (self.Cs, self.Rs, self.mus, self.subquantizers)
        params = train(data, self.V, self.M, self.subquantizer_clusters, existing,
                       kmeans_coarse_iters, kmeans_local_iters, n_init,
                       subquantizer_sample_ratio, random_state, verbose)
        self.__init__(parameters=params)

    # --------------------------------------------------------------- helpers

    def get_split_parameters(self, split):
        return (self.Cs[split] if self.Cs is not None else None,
                self.Rs[split] if self.Rs is not None else None,
                self.mus[split] if self.mus is not None else None,
                self.subquantizers[split] if self.subquantizers is not None else None)

    def _split_input(self, x):
        x = np.asarray(x, dtype=np.float32)
        return np.split(x, self.num_coarse_splits, axis=-1)

    # ---------------------------------------------------------------- encode

    def predict(self, x):
        """Code one vector; returns ``LOPQCode(coarse_tuple, fine_tuple)``
        with size-fitted uint dtypes (reference contract)."""
        coarse, fine = self.predict_batch(np.asarray(x, dtype=np.float32)[None, :])
        return LOPQCode(tuple(coarse[0]), tuple(fine[0]))

    def predict_coarse(self, x):
        coarse = self._predict_coarse_batch(np.asarray(x, dtype=np.float32)[None, :])
        return tuple(coarse[0])

    def predict_fine(self, x, coarse_codes=None):
        x = np.asarray(x, dtype=np.float32)
        if coarse_codes is None:
            coarse_codes = self.predict_coarse(x)
        coarse = np.asarray(coarse_codes, dtype=np.int32)[None, :]
        fine = self._predict_fine_batch(x[None, :], coarse)
        return tuple(fine[0])

    def predict_batch(self, X):
        """Code N vectors at once on device.

        :param X: [N, D] array
        :returns: (coarse [N, 2] and fine [N, M] numpy arrays, dtypes sized to
            the codebook cardinalities)
        """
        X = np.asarray(X, dtype=np.float32)
        coarse = self._predict_coarse_batch(X)
        fine = self._predict_fine_batch(X, coarse.astype(np.int32))
        return coarse, fine

    def _predict_coarse_batch(self, X):
        halves = self._split_input(X)
        cols = []
        for split, xh in enumerate(halves):
            a, _ = assign_clusters(xh, self.Cs[split])
            cols.append(np.asarray(a))
        return np.stack(cols, axis=1).astype(code_dtype_for(self.V))

    def _predict_fine_batch(self, X, coarse):
        PX = self.project_batch(X, coarse)  # [N, D'] locally projected
        halves = np.split(PX, self.num_coarse_splits, axis=1)
        fine_cols = []
        for split, ph in enumerate(halves):
            subC = self.subquantizers[split]
            for sub_split, fx in enumerate(np.split(ph, self.num_fine_splits, axis=1)):
                a, _ = assign_clusters(fx, subC[sub_split])
                fine_cols.append(np.asarray(a))
        return np.stack(fine_cols, axis=1).astype(
            code_dtype_for(self.subquantizer_clusters))

    # --------------------------------------------------------------- project

    def project(self, x, coarse_codes, coarse_split=None):
        """Project one vector to its local residual frame
        (reference: lopq/lopq/model.py:604-641)."""
        x = np.asarray(x, dtype=np.float32)
        if coarse_split is not None:
            xh = self._split_input(x)[coarse_split]
            c = int(coarse_codes[coarse_split])
            C, R, mu, _ = self.get_split_parameters(coarse_split)
            r = xh - C[c]
            return np.dot(R[c], r - mu[c])
        coarse = np.asarray(coarse_codes, dtype=np.int32)[None, :]
        return self.project_batch(x[None, :], coarse)[0]

    def project_batch(self, X, coarse):
        """Batched local projection for N points given coarse codes [N, 2]."""
        halves = self._split_input(X)
        coarse = np.asarray(coarse, dtype=np.int32)
        outs = []
        for split, xh in enumerate(halves):
            C, R, mu, _ = self.get_split_parameters(split)
            a = coarse[:, split]
            residuals = xh - C[a]
            outs.append(np.asarray(
                project_residuals_to_local(residuals, a, R, mu)))
        return np.concatenate(outs, axis=1)

    # ----------------------------------------------------------- reconstruct

    def reconstruct(self, codes):
        """Decode one code tuple back to an approximate vector
        (reference: lopq/lopq/model.py:643-671)."""
        coarse_codes, fine_codes = codes
        x = []
        fine_per_split = self.num_fine_splits
        for split in range(self.num_coarse_splits):
            C, R, mu, subC = self.get_split_parameters(split)
            fc = fine_codes[split * fine_per_split:(split + 1) * fine_per_split]
            sx = np.concatenate([subC[i][int(c)] for i, c in enumerate(fc)])
            cluster = int(coarse_codes[split])
            r = np.dot(R[cluster].T, sx) + mu[cluster]
            x.append(r + C[cluster])
        return np.concatenate(x)

    def reconstruct_batch(self, coarse, fine):
        """Decode N code rows at once: [N, 2] coarse + [N, M] fine -> [N, D]."""
        coarse = np.asarray(coarse, dtype=np.int32)
        fine = np.asarray(fine, dtype=np.int32)
        N = coarse.shape[0]
        outs = []
        for split in range(self.num_coarse_splits):
            C, R, mu, subC = self.get_split_parameters(split)
            fcols = fine[:, split * self.num_fine_splits:(split + 1) * self.num_fine_splits]
            sx = np.concatenate(
                [subC[i][fcols[:, i]] for i in range(self.num_fine_splits)], axis=1)
            a = coarse[:, split]
            Rg = jnp.asarray(R)[a]  # [N, Dh, Dh]
            r = np.asarray(jnp.einsum("nji,nj->ni", Rg, jnp.asarray(sx),
                                      precision="highest")) + mu[a]
            outs.append(r + C[a])
        return np.concatenate(outs, axis=1)

    # ------------------------------------------------------------- distances

    def get_subquantizer_distances(self, x, coarse_codes, coarse_split=None):
        """Squared distances from the locally-projected query to every
        subquantizer centroid — the ADC lookup tables
        (reference: lopq/lopq/model.py:673-704).

        :returns: list of [S] arrays, one per subquantizer in the requested
            split(s)
        """
        x = np.asarray(x, dtype=np.float32)
        splits = ([coarse_split] if coarse_split is not None
                  else range(self.num_coarse_splits))
        dists = []
        for split in splits:
            px = self.project(x, coarse_codes, coarse_split=split)
            subC = self.subquantizers[split]
            for sub_split, fx in enumerate(np.split(px, self.num_fine_splits)):
                d = ((fx[None, :] - subC[sub_split]) ** 2).sum(axis=1)
                dists.append(d)
        return dists

    def get_cell_id_for_coarse_codes(self, coarse_codes):
        return int(coarse_codes[1]) + int(coarse_codes[0]) * self.V

    def get_coarse_codes_for_cell_id(self, cell_id):
        return (int(cell_id) // self.V, int(cell_id) % self.V)

    # ----------------------------------------------------------- persistence

    def export_mat(self, filename):
        """Export parameters as .mat (same array layout as the reference,
        lopq/lopq/model.py:712-728)."""
        from scipy.io import savemat

        Cs = np.stack(self.Cs)
        Rs = np.stack(self.Rs)
        mus = np.stack(self.mus)
        subs = np.stack([np.stack(half) for half in self.subquantizers])
        savemat(filename, {"Cs": Cs, "Rs": Rs, "mus": mus, "subs": subs,
                           "V": self.V, "M": self.M})

    @staticmethod
    def load_mat(filename):
        from scipy.io import loadmat

        d = loadmat(filename)
        M = int(d["M"][0][0])
        Cs = tuple(np.squeeze(a) for a in np.split(d["Cs"], 2, axis=0))
        Rs = tuple(np.squeeze(a) for a in np.split(d["Rs"], 2, axis=0))
        mus = tuple(np.squeeze(a) for a in np.split(d["mus"], 2, axis=0))
        subs = tuple(
            [np.squeeze(s) for s in np.split(np.squeeze(half), M // 2, axis=0)]
            for half in np.split(d["subs"], 2, axis=0))
        return LOPQModel(parameters=(Cs, Rs, mus, subs))

    def export_npz(self, filename):
        np.savez_compressed(
            filename,
            Cs=np.stack(self.Cs), Rs=np.stack(self.Rs), mus=np.stack(self.mus),
            subs=np.stack([np.stack(h) for h in self.subquantizers]),
            V=self.V, M=self.M)

    @staticmethod
    def load_npz(filename):
        d = np.load(filename)
        M = int(d["M"])
        Cs = tuple(d["Cs"])
        Rs = tuple(d["Rs"])
        mus = tuple(d["mus"])
        subs = tuple(list(half) for half in d["subs"])
        return LOPQModel(parameters=(Cs, Rs, mus, subs))

    def export_proto(self, f):
        """Export in the reference's protobuf wire format
        (reference: lopq/lopq/lopq_model_pb2.py schema; model.py:748-786)."""
        from columbiaimagesearch_tpu.index import proto

        proto.export_proto(self, f)

    @staticmethod
    def load_proto(filename):
        from columbiaimagesearch_tpu.index import proto

        return proto.load_proto(filename)


class LOPQModelPCA(LOPQModel):
    """LOPQ over a PCA-reduced space (reference: lopq/lopq/model.py:823-1185).

    Adds ``pca_P``/``pca_mu`` projection parameters, an optional post-PCA L2
    renormalization, and applies PCA inside ``predict``.
    """

    def __init__(self, V=8, M=4, subquantizer_clusters=256, renorm=False,
                 parameters=None):
        if parameters is not None:
            base, self.pca_P, self.pca_mu = parameters[:4], parameters[4], parameters[5]
            if self.pca_P is not None:
                self.pca_P = np.asarray(self.pca_P, dtype=np.float32)
            if self.pca_mu is not None:
                self.pca_mu = np.asarray(self.pca_mu, dtype=np.float32)
        else:
            base, self.pca_P, self.pca_mu = None, None, None
        self.renorm = renorm
        super().__init__(V=V, M=M, subquantizer_clusters=subquantizer_clusters,
                         parameters=base)

    def fit_pca(self, data, pca_dims=256, pca_subsample=None):
        if self.pca_P is None or self.pca_mu is None:
            pca_params, _ = train_pca(data, pca_dims, pca_subsample)
            self.pca_P = pca_params["P"].astype(np.float32)
            self.pca_mu = pca_params["mu"].astype(np.float32)
        else:
            raise ValueError("You are trying to retrain PCA...")

    def fit(self, data, pca_dims=256, kmeans_coarse_iters=10,
            kmeans_local_iters=20, n_init=10, subquantizer_sample_ratio=1.0,
            random_state=None, verbose=False, pca_subsample=None,
            apply_pca=True, train_pca=True):
        existing = (self.Cs, self.Rs, self.mus, self.subquantizers)
        if train_pca:
            self.fit_pca(data, pca_dims, pca_subsample)
        pca_data = self.apply_PCA(data) if apply_pca else data
        # NB: the ``train_pca`` *argument* shadows the imported function here,
        # but the module-level ``train`` is unaffected.
        params = train(
            pca_data, self.V, self.M, self.subquantizer_clusters, existing,
            kmeans_coarse_iters, kmeans_local_iters, n_init,
            subquantizer_sample_ratio, random_state, verbose)
        pca_P, pca_mu, renorm = self.pca_P, self.pca_mu, self.renorm
        self.__init__(renorm=renorm, parameters=params + (pca_P, pca_mu))

    def apply_PCA(self, x, dtype=np.float32):
        """PCA-project (and optionally L2-renormalize) samples
        (reference: lopq/lopq/model.py:961-978)."""
        x = np.asarray(x)
        pca_data = np.dot(x - self.pca_mu, self.pca_P)
        if self.renorm:
            norm = np.linalg.norm(pca_data, axis=-1, keepdims=True)
            pca_data = pca_data / norm
        return pca_data.astype(dtype=dtype)

    def predict(self, x):
        x_pca = self.apply_PCA(np.asarray(x, dtype=np.float32))
        coarse, fine = super().predict_batch(x_pca[None, :])
        return LOPQCode(tuple(coarse[0]), tuple(fine[0]))

    def predict_batch(self, X):
        """NB: unlike the base class, applies PCA first (reference contract:
        LOPQModelPCA.predict applies PCA, model.py:980-1003)."""
        return super().predict_batch(self.apply_PCA(np.asarray(X, dtype=np.float32)))

    def export_npz(self, filename):
        np.savez_compressed(
            filename,
            Cs=np.stack(self.Cs), Rs=np.stack(self.Rs), mus=np.stack(self.mus),
            subs=np.stack([np.stack(h) for h in self.subquantizers]),
            V=self.V, M=self.M, pca_P=self.pca_P, pca_mu=self.pca_mu,
            renorm=self.renorm)

    @staticmethod
    def load_npz(filename):
        d = np.load(filename)
        M = int(d["M"])
        Cs = tuple(d["Cs"])
        Rs = tuple(d["Rs"])
        mus = tuple(d["mus"])
        subs = tuple(list(half) for half in d["subs"])
        return LOPQModelPCA(
            renorm=bool(d["renorm"]),
            parameters=(Cs, Rs, mus, subs, d["pca_P"], d["pca_mu"]))
