"""Linear one-class SVM late fusion (score calibration layer).

The reference fits two ``sklearn.linear_model.SGDOneClassSVM`` instances
(``detect_fuser``/``seg_fuser``, features.py:114-115, nu=0.5, max_iter=1000,
random_state=42) over the per-method λ-weighted score vectors of a second
training pass, then uses ``score_samples`` as the final anomaly score
(note reference quirk Q9: ``score_samples`` is higher-is-more-NORMAL in
sklearn; the pipeline feeds it to AUROC as-is, so the sign convention is
inherited — we replicate it).

Two backends:
  * 'sklearn' — wraps sklearn exactly (default; bit-parity with the
    reference, fit happens on host once per class on tiny 1-/2-d inputs);
  * 'jax'     — a jitted SGD reimplementation of the same objective
    (one-class hinge with 'optimal' learning-rate schedule), for
    deployments without sklearn; statistically equivalent, not bit-equal.
"""

from __future__ import annotations

import numpy as np


class SGDOneClassSVM:
    """Facade with sklearn and pure-JAX backends."""

    def __init__(self, nu: float = 0.5, max_iter: int = 1000,
                 random_state: int = 42, backend: str = "sklearn"):
        self.nu = nu
        self.max_iter = max_iter
        self.random_state = random_state
        self.backend = backend
        self._skl = None
        self.coef_ = None
        self.offset_ = None

    # ------------------------------------------------------------------
    def fit(self, x: np.ndarray) -> "SGDOneClassSVM":
        x = np.asarray(x, np.float64)
        if self.backend == "sklearn":
            from sklearn.linear_model import SGDOneClassSVM as _Skl
            self._skl = _Skl(nu=self.nu, max_iter=self.max_iter,
                             random_state=self.random_state)
            self._skl.fit(x)
            self.coef_ = np.asarray(self._skl.coef_)
            self.offset_ = np.asarray(self._skl.offset_)
            return self
        if self.backend == "jax":
            self.coef_, self.offset_ = _fit_jax(
                x, nu=self.nu, max_iter=self.max_iter, seed=self.random_state)
            return self
        raise ValueError(self.backend)

    def score_samples(self, x: np.ndarray) -> np.ndarray:
        """sklearn semantics: decision_function + offset = x·w (un-shifted).

        With only restored weights (``load_weights`` — bank-cache serving),
        the linear form x·coef is used directly; it is exactly what
        sklearn's score_samples computes for SGDOneClassSVM."""
        x = np.asarray(x, np.float64)
        if self.backend == "sklearn" and self._skl is not None:
            return self._skl.score_samples(x)
        return x @ np.asarray(self.coef_, np.float64).reshape(-1)

    def load_weights(self, coef, offset) -> "SGDOneClassSVM":
        """Restore a fitted fuser from persisted weights (no sklearn object)."""
        self.coef_ = np.asarray(coef, np.float64).reshape(1, -1)
        self.offset_ = np.asarray(offset, np.float64).reshape(-1)
        self._skl = None
        return self

    def decision_function(self, x: np.ndarray) -> np.ndarray:
        return self.score_samples(x) - self.offset_


def _fit_jax(x: np.ndarray, nu: float, max_iter: int, seed: int):
    """SGD on the linear one-class SVM objective (sklearn formulation).

    minimise  nu/2 ||w||² + rho·nu + mean_i max(0, rho - w·x_i)
    with sklearn's 'optimal' schedule eta_t = 1 / (alpha (t0 + t)),
    alpha = nu/2.  Deterministic per-epoch shuffling from ``seed``.
    """
    import jax
    import jax.numpy as jnp

    n, d = x.shape
    alpha = nu / 2.0
    # sklearn's heuristic t0 via typical loss at w=0 (approximated)
    t0 = 1.0 / (alpha * max(1.0, float(np.abs(x).mean())))

    xj = jnp.asarray(x, jnp.float32)

    def epoch(carry, key):
        w, rho, t = carry
        perm = jax.random.permutation(key, n)

        def step(carry, i):
            w, rho, t = carry
            xi = xj[i]
            eta = 1.0 / (alpha * (t0 + t))
            margin = rho - jnp.dot(w, xi)
            active = (margin > 0).astype(jnp.float32)
            # per-sample objective nu/2·||w||² − nu·rho + max(0, rho − w·x)
            grad_w = alpha * w - active * xi
            grad_rho = active - nu
            w = w - eta * grad_w
            rho = rho - eta * grad_rho
            return (w, rho, t + 1.0), None

        (w, rho, t), _ = jax.lax.scan(step, (w, rho, t), perm)
        return (w, rho, t), None

    keys = jax.random.split(jax.random.PRNGKey(seed), max_iter)
    init = (jnp.zeros((d,), jnp.float32), jnp.float32(0.0), jnp.float32(1.0))
    (w, rho, _), _ = jax.lax.scan(epoch, init, keys)
    return np.asarray(w, np.float64).reshape(1, -1), np.asarray([float(rho)])
