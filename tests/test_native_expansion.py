"""C++ alpha-expansion parity solver vs brute-force exact minimum
(SURVEY.md §4: optimizer vs exhaustive search on tiny MRFs), including
label costs — and agreement between the TPU relaxation and the expansion
oracle on pipeline-sized problems."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from multih_tpu import native
from multih_tpu.models import labeling

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++/native build unavailable"
)


def directed_edges_from_knn(nbr_idx, nbr_w):
    n, k = nbr_idx.shape
    pq, w = [], []
    for i in range(n):
        for j in range(k):
            if nbr_w[i, j] > 0:
                pq.append((i, nbr_idx[i, j]))
                w.append(nbr_w[i, j])
    return np.array(pq, np.int32).reshape(-1, 2), np.array(w, np.float64)


def brute_force(d, pq, w, lam, h):
    n, L = d.shape
    best_lab, best_e = None, np.inf
    for lab in itertools.product(range(L), repeat=n):
        lab = np.array(lab)
        e = d[np.arange(n), lab].sum()
        e += 0.5 * lam * sum(
            wi for (p, q), wi in zip(pq, w) if lab[p] != lab[q]
        )
        e += sum(h[l] for l in range(L) if (lab == l).any())
        if e < best_e:
            best_e, best_lab = e, lab
    return best_lab, best_e


class TestExpansionExact:
    def _problem(self, rng, n=7, L=3, k=2):
        pts = rng.uniform(0, 10, (n, 2)).astype(np.float32)
        nbr_idx, nbr_w = labeling.knn_graph(
            jnp.asarray(pts), jnp.ones(n), k
        )
        pq, w = directed_edges_from_knn(
            np.asarray(nbr_idx), np.asarray(nbr_w)
        )
        d = rng.uniform(0, 1, (n, L))
        return d, pq, w

    def test_matches_bruteforce_no_label_cost(self, rng):
        for _ in range(8):
            d, pq, w = self._problem(rng)
            h = np.zeros(3)
            lab, e = native.expansion_solve(d, pq, w, 0.5, h)
            _, e_opt = brute_force(d, pq, w, 0.5, h)
            assert e <= e_opt + 1e-6, (e, e_opt)

    def test_matches_bruteforce_with_label_costs(self, rng):
        hits = 0
        for _ in range(8):
            d, pq, w = self._problem(rng)
            h = np.array([0.8, 0.5, 1.2])
            lab, e = native.expansion_solve(d, pq, w, 0.4, h)
            _, e_opt = brute_force(d, pq, w, 0.4, h)
            # expansion is approximate in general but near-exact here
            assert e <= e_opt * 1.02 + 1e-6, (e, e_opt)
            hits += int(e <= e_opt + 1e-6)
        assert hits >= 6

    def test_energy_is_true_energy(self, rng):
        d, pq, w = self._problem(rng)
        h = np.array([0.3, 0.0, 0.7])
        lab, e = native.expansion_solve(d, pq, w, 0.6, h)
        n, L = d.shape
        e_check = d[np.arange(n), lab].sum()
        e_check += 0.3 * sum(
            wi for (p, q), wi in zip(pq, w) if lab[p] != lab[q]
        ) * 2 * 0.5  # lambda=0.6 halved per directed edge
        e_check += sum(h[l] for l in range(L) if (lab == l).any())
        assert abs(e - e_check) < 1e-6

    def test_strong_smoothness_constant(self, rng):
        d, pq, w = self._problem(rng)
        lab, _ = native.expansion_solve(d, pq, w, 100.0, np.zeros(3))
        assert len(np.unique(lab)) == 1

    def test_zero_smoothness_argmin(self, rng):
        d, pq, w = self._problem(rng)
        lab, _ = native.expansion_solve(d, pq, w, 0.0, np.zeros(3))
        np.testing.assert_array_equal(lab, d.argmin(1))

    def test_label_cost_drops_marginal_label(self, rng):
        # two points prefer label 1 by a hair; big h_1 must push them off it
        d = np.array([[0.1, 0.05, 1.0], [0.1, 0.05, 1.0]])
        pq = np.array([[0, 1], [1, 0]], np.int32)
        w = np.ones(2)
        lab, _ = native.expansion_solve(d, pq, w, 0.0, np.array([0.0, 5.0, 0.0]))
        np.testing.assert_array_equal(lab, [0, 0])


class TestRelaxationAgreesWithExpansion:
    """The TPU mean-field/ICM must land within a few % of the expansion
    oracle's labeling on realistic problem shapes (the BASELINE.json:5
    agreement contract is checked end-to-end elsewhere; this isolates the
    discrete solver)."""

    def _pipeline_like_problem(self, rng, n=300, L=5):
        pts = rng.uniform(0, 640, (n, 2)).astype(np.float32)
        nbr_idx, nbr_w = labeling.knn_graph(jnp.asarray(pts), jnp.ones(n), 6)
        # synthetic truncated-quadratic-style data costs: planes = spatial
        # blobs with low cost
        centers = rng.uniform(100, 540, (L - 1, 2))
        d = np.full((n, L), 1.0)
        for l in range(L - 1):
            dist = np.linalg.norm(pts - centers[l], axis=1)
            r = (dist / 120.0) ** 2 + rng.uniform(0, 0.3, n)
            d[:, l] = np.minimum(r, 8.0)
        return d.astype(np.float64), nbr_idx, nbr_w

    def test_label_agreement(self, rng):
        lam = 0.2
        d, nbr_idx, nbr_w = self._pipeline_like_problem(rng)
        pq, w = directed_edges_from_knn(
            np.asarray(nbr_idx), np.asarray(nbr_w)
        )
        lab_cpp, e_cpp = native.expansion_solve(
            d, pq, w, lam, np.zeros(d.shape[1])
        )
        dj = jnp.asarray(d, jnp.float32)
        q = labeling.mean_field(dj, nbr_idx, nbr_w, lam, 20, 2.0, 0.1)
        lab_tpu = labeling.best_labeling(
            [jnp.argmax(q, 1), jnp.argmin(dj, 1)], dj, nbr_idx, nbr_w,
            lam, 6,
        )
        lab_tpu = np.asarray(lab_tpu)
        e_tpu = labeling.mrf_energy(
            jnp.asarray(lab_tpu), dj, nbr_idx, nbr_w, lam
        )
        # the relaxation reaches the expansion optimum's energy to <0.5%;
        # residual label disagreement sits on energy-degenerate (genuinely
        # ambiguous) points, so it is bounded loosely
        disagree = float(np.mean(lab_cpp != lab_tpu))
        assert disagree < 0.05, f"{disagree:.3f} disagreement"
        assert float(e_tpu) <= e_cpp * 1.005 + 1e-3, (float(e_tpu), e_cpp)
