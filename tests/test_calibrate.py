"""Calibration tests, modeled on the vendored package's own fixtures
(dirichlet_python/dirichletcal/tests/): Beta-distributed synthetic binary
and ternary examples with accuracy/loss-improvement thresholds."""
import numpy as np
import pytest

from mural_tpu.calibrate import (FullDirichletCalibrator,
                                 MultinomialRegression, TemperatureScaling,
                                 VectorScaling, brier_score, calibrate_prob,
                                 classwise_ece, ece, nll_from_probs,
                                 poisson_calibrate)


def _binary_example(n=1000, seed=42):
    """Miscalibrated binary probabilities: true P(y=1|s) != s."""
    rng = np.random.default_rng(seed)
    s = rng.beta(2, 5, size=n)                  # predicted prob of class 1
    true_p = np.clip(s ** 0.5, 0, 1)            # actual frequency
    y = (rng.uniform(size=n) < true_p).astype(int)
    probs = np.stack([1 - s, s], axis=1)
    return probs, y


def _ternary_example(n=3000, seed=7):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(n, 3)) * 2.0
    temp_logits = logits / 3.0                  # overconfident model
    def softmax(z):
        e = np.exp(z - z.max(1, keepdims=True))
        return e / e.sum(1, keepdims=True)
    true_probs = softmax(logits)
    y = np.array([rng.choice(3, p=p) for p in true_probs])
    probs = softmax(temp_logits * 3.5)          # distorted predictions
    return probs, y


def test_full_dirichlet_improves_nll_binary():
    probs, y = _binary_example()
    cal = FullDirichletCalibrator().fit(probs, y)
    out = cal.predict_proba(probs)
    assert out.shape == probs.shape
    assert np.allclose(out.sum(1), 1, atol=1e-9)
    assert nll_from_probs(out, y) < nll_from_probs(probs, y) - 1e-4


def test_full_dirichlet_ternary_and_weights_shape():
    probs, y = _ternary_example()
    cal = FullDirichletCalibrator().fit(probs, y)
    assert cal.weights_.shape == (3, 4)
    assert cal.coef_.shape == (3, 3)
    out = cal.predict_proba(probs)
    assert nll_from_probs(out, y) <= nll_from_probs(probs, y) + 1e-12
    # ref_row normalization: last row of raw weights subtracted -> the
    # weights of the last class row are ~0 only pre-subtraction; check
    # predict is invariant to adding a constant row
    shifted = cal.weights_ + 1.0
    logits = np.hstack([np.log(probs), np.ones((len(y), 1))]) @ shifted.T
    e = np.exp(logits - logits.max(1, keepdims=True))
    assert np.allclose(e / e.sum(1, keepdims=True), out, atol=1e-9)


def test_extreme_probabilities_no_nan():
    rng = np.random.default_rng(0)
    probs, y = _binary_example(400)
    probs[probs < 0.02] = 0.0          # exact zeros -> clip_for_log path
    probs[probs > 0.98] = 1.0
    probs = probs / probs.sum(1, keepdims=True)
    cal = FullDirichletCalibrator().fit(probs, y)
    out = cal.predict_proba(probs)
    assert np.isfinite(out).all()


def test_newton_vs_lbfgs_agree():
    probs, y = _ternary_example(800)
    a = MultinomialRegression(method="Full", optimizer="newton")
    b = MultinomialRegression(method="Full", optimizer="fmin_l_bfgs_b")
    X = np.log(np.clip(probs, 1e-300, 1))
    a.fit(X, y)
    b.fit(X, y)
    pa, pb = a.predict_proba(X), b.predict_proba(X)
    assert nll_from_probs(pa, y) == pytest.approx(
        nll_from_probs(pb, y), abs=5e-3)


def test_temperature_and_vector_scaling():
    probs, y = _ternary_example(1500)
    for cls, shape in [(TemperatureScaling, (3, 4)),
                       (VectorScaling, (3, 4))]:
        cal = cls(logit_constant=0.0).fit(probs, y)
        out = cal.predict_proba(probs)
        assert out.shape == probs.shape
        assert np.allclose(out.sum(1), 1, atol=1e-9)
        assert nll_from_probs(out, y) <= nll_from_probs(probs, y) + 1e-9
        assert cal.weights_.shape == shape


def test_temperature_is_single_param():
    """FixDiag: coef_ must be a scaled identity (one temperature)."""
    probs, y = _ternary_example(500)
    cal = TemperatureScaling(logit_constant=0.0).fit(probs, y)
    c = cal.calibrator_.weights_[:, :-1]
    off = c - np.diag(np.diag(c))
    # ref_row subtraction makes rows differ by a constant; check the
    # pre-subtraction structure via rank-1 correction: all diagonal
    # entries equal up to the subtracted last row
    assert np.allclose(np.diag(c)[:-1], np.diag(c)[0])


def test_poisson_calibrate_golden():
    import pandas as pd
    probs = pd.DataFrame({
        "prob0": [0.9, 0.99],
        "prob1": [0.06, 0.004],
        "prob2": [0.04, 0.006],
    })
    out = poisson_calibrate(probs)
    lam = -np.log([0.9, 0.99])
    assert np.allclose(out["prob0"], 1 - lam)
    assert np.allclose(out["prob1"], [0.06, 0.004] * lam / (1 - np.array([0.9, 0.99])))
    # ndarray input path
    out2 = poisson_calibrate(probs.to_numpy())
    assert np.allclose(out2, out.to_numpy())


def test_metrics_sanity():
    probs, y = _ternary_example(1000)
    e = ece(probs, y, 50)
    c = classwise_ece(probs, y, 50)
    b = brier_score(probs, y)
    assert 0 <= e <= 1 and 0 <= c <= 1 and 0 <= b <= 2
    # perfect one-hot predictions on true labels -> all metrics ~0
    perfect = np.full((100, 3), 1e-12)
    yy = np.arange(100) % 3
    perfect[np.arange(100), yy] = 1.0
    assert ece(perfect, yy) < 1e-6
    assert brier_score(perfect, yy) < 1e-6


def test_calibrate_prob_end_to_end_and_pickle(tmp_path):
    import pickle
    probs, y = _ternary_example(1200)
    lines = []
    cal, nll = calibrate_prob(probs, y, "FullDiri",
                              printer=lambda *a: lines.append(a))
    assert np.isfinite(nll)
    # pickles cleanly next to a checkpoint (training.py:574-575)
    p = tmp_path / "model.fdiri_cal.pkl"
    with open(p, "wb") as fh:
        pickle.dump(cal, fh)
    with open(p, "rb") as fh:
        cal2 = pickle.load(fh)
    assert np.allclose(cal2.predict_proba(probs), cal.predict_proba(probs))


def test_newton_direction_solves_fd_hessian_system():
    """The block-assembled Hessian (multinomial._newton_dir) must give
    the same Newton direction as the true Hessian of the objective:
    H @ updates == gradient, with H from central differences of
    jax.grad.  Guards the chain-rule assembly (row-separable data term
    + regulariser + linear parameterisation) against regression without
    paying a jax.hessian compile.  Holds exactly even where the
    parameterisation is rank-deficient (g is in range(L^T) = range(H))."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from mural_tpu.calibrate import multinomial as M

    rng = np.random.default_rng(11)
    k, n = 3, 150
    P = rng.dirichlet(np.ones(k) * 0.4, size=n)
    eps = np.finfo(np.float64).eps
    P = np.clip(P, eps, 1 - eps)
    X = jnp.asarray(np.hstack([np.log(P), np.ones((n, 1))]))
    T = jnp.asarray(np.eye(k)[rng.integers(0, k, n)], jnp.float64)

    with jax.enable_x64(True), jax.default_device(jax.devices("cpu")[0]):
        for method, ref_row in [("Full", True), ("Full", False),
                                ("Diag", False), ("FixDiag", False)]:
            w0 = jnp.asarray(M._identity_init(k, method), jnp.float64)
            w0 = w0 + 0.05 * jnp.asarray(rng.standard_normal(w0.shape))
            statics = dict(k=k, method=method, ref_row=ref_row,
                           reg_format=None, reg_mu_none=True)
            rl, rm = jnp.float64(1e-3), jnp.float64(0.0)
            g, u, cand, Ls = M._newton_dir(w0, X, T, rl, rm, **statics)
            assert bool(jnp.all(jnp.isfinite(u))), (method, ref_row)

            obj = partial(M._objective, k=k, method=method,
                          reg_lambda=1e-3, reg_mu=None,
                          ref_row=ref_row, reg_format=None)
            grad = jax.jit(jax.grad(obj))
            h = 1e-5
            cols = []
            for j in range(w0.size):
                e = jnp.zeros_like(w0).at[j].set(h)
                cols.append((grad(w0 + e, X, T) - grad(w0 - e, X, T))
                            / (2 * h))
            H_fd = np.stack([np.asarray(c) for c in cols], axis=1)
            resid = H_fd @ np.asarray(u).ravel() - np.asarray(g)
            scale = 1.0 + np.abs(np.asarray(g)).max()
            assert np.abs(resid).max() / scale < 1e-5, (method, ref_row)
