"""Training-core tests: LR schedule parity vs an explicit torch-style
simulation, optimizer parity vs torch on a tiny problem, train-step
mechanics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mural_tpu.train.optim import LRSchedule, auto_weight_decay
from mural_tpu.train.early_stopping import EarlyStopping

torch = pytest.importorskip("torch")


def _simulate_torch_steplr(base_lr, gamma, step_size, restart_lr, min_lr,
                           n_steps):
    """The reference's loop: optimizer step -> scheduler.step() -> restart
    check (training.py:444-451).  Record the LR *used* by each step."""
    lr = base_lr
    used = []
    for step in range(n_steps):
        used.append(lr)
        # scheduler.step(): decay when the (step+1)-th call crosses a
        # multiple of step_size (torch StepLR decays every step_size calls)
        if (step + 1) % step_size == 0:
            lr = lr * gamma
        if lr < min_lr:
            lr = restart_lr
    return used


@pytest.mark.parametrize("base,gamma,ss", [(1e-3, 0.9, 5), (5e-3, 0.5, 3),
                                           (1e-3, 0.95, 1)])
def test_steplr_parity(base, gamma, ss):
    sched = LRSchedule.build("StepLR", base, gamma, batch_size=128 * 5000 // ss,
                             train_size=10_000_000, restart_lr=1e-4,
                             min_lr=1e-6)
    assert sched.step_size == ss
    n = 400
    ref = _simulate_torch_steplr(base, gamma, ss, 1e-4, 1e-6, n)
    ours = [float(sched.lr_at(jnp.asarray(s), jnp.asarray(0)))
            for s in range(n)]
    assert np.allclose(ours, ref, rtol=1e-5)


def test_steplr2_epoch_restart():
    # steps_per_epoch = 20, restart 1e-4 -> min 1e-6 over one epoch
    sched = LRSchedule.build("StepLR2", 1e-3, 0.9, batch_size=50,
                             train_size=1000, restart_lr=1e-4, min_lr=1e-6)
    assert sched.steps_per_epoch == 20
    gamma = (1e-6 / 1e-4) ** (1 / 20)
    # epoch 0 starts from base lr
    assert float(sched.lr_at(jnp.asarray(0), jnp.asarray(0))) == \
        pytest.approx(1e-3)
    assert float(sched.lr_at(jnp.asarray(5), jnp.asarray(0))) == \
        pytest.approx(1e-3 * gamma ** 5, rel=1e-5)
    # epoch 1 resets to restart_lr
    assert float(sched.lr_at(jnp.asarray(20), jnp.asarray(1))) == \
        pytest.approx(1e-4)
    assert float(sched.lr_at(jnp.asarray(39), jnp.asarray(1))) == \
        pytest.approx(1e-4 * gamma ** 19, rel=1e-4)


def test_auto_weight_decay():
    # training.py:343: wd = 1 - wda ** (batch/(epochs*train_size))
    wd = auto_weight_decay(0.1, 128, 10, 100_000, 0.01)
    assert wd == pytest.approx(1 - 0.1 ** (128 / (10 * 100_000)))
    assert auto_weight_decay(None, 128, 10, 100, 0.01) == 0.01
    with pytest.raises(ValueError):
        auto_weight_decay(1.5, 128, 10, 100, 0.01)


@pytest.mark.parametrize("name,torch_factory", [
    ("Adam", lambda p, lr, wd: torch.optim.Adam(p, lr=lr, weight_decay=wd)),
    ("AdamW", lambda p, lr, wd: torch.optim.AdamW(p, lr=lr, weight_decay=wd,
                                                  amsgrad=True)),
    ("SGD", lambda p, lr, wd: torch.optim.SGD(p, lr=lr, weight_decay=wd,
                                              momentum=0.98, nesterov=True)),
])
def test_optimizer_parity_with_torch(name, torch_factory):
    """Our optax chains must track torch optimizers step-for-step on a
    deterministic quadratic problem."""
    import optax
    from mural_tpu.train.optim import build_optimizer

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(6,)).astype(np.float32)
    target = rng.normal(size=(6,)).astype(np.float32)
    lr, wd = 1e-2, 0.05

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch_factory([tw], lr, wd)

    tx = build_optimizer(name, wd)
    params = jnp.asarray(w0)
    opt_state = tx.init(params)

    for step in range(25):
        with torch.no_grad():
            pass
        topt.zero_grad()
        loss_t = ((tw - torch.from_numpy(target)) ** 2).sum()
        loss_t.backward()
        topt.step()

        grads = 2 * (params - jnp.asarray(target))
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)

    assert np.allclose(np.asarray(params), tw.detach().numpy(),
                       atol=2e-5), np.abs(
                           np.asarray(params) - tw.detach().numpy()).max()


def test_train_step_runs_and_learns():
    from mural_tpu.models.snv import SNVNet0
    from mural_tpu.train.state import create_train_state
    from mural_tpu.train.steps import make_eval_step, make_train_step

    rng = np.random.default_rng(3)
    B, K = 64, 7
    model = SNVNet0(emb_vocab=5, n_cat=K, lin_layer_sizes=[32, 16],
                    emb_dropout=0.0, lin_layer_dropouts=[0.0, 0.0],
                    n_class=4)
    cat = jnp.asarray(rng.integers(0, 4, size=(B, K)), dtype=jnp.int32)
    # learnable rule: label = center base
    y = jnp.asarray(np.asarray(cat)[:, K // 2] % 4, dtype=jnp.int32)
    codes = jnp.asarray(rng.integers(0, 4, size=(B, 21)), dtype=jnp.uint8)
    mask = jnp.ones((B,), jnp.float32)

    variables = model.init(jax.random.key(0), cat, None, None, False)
    sched = LRSchedule.build("constant", 1e-2, 0.9, B, B, 1e-4, 1e-6)
    state = create_train_state(model, variables, "Adam", 0.0, sched)
    train_step = make_train_step(model, donate=False)
    eval_step = make_eval_step(model)

    base_rng = jax.random.key(1)
    _, loss0 = eval_step(state.params, state.batch_stats, y, cat, None,
                         codes, mask)
    for _ in range(60):
        state, loss, lr = train_step(state, y, cat, None, codes, mask,
                                     base_rng)
    _, loss1 = eval_step(state.params, state.batch_stats, y, cat, None,
                         codes, mask)
    assert float(loss1) < float(loss0) * 0.5
    assert int(state.step) == 60


def test_masked_loss_ignores_padding():
    from mural_tpu.train.steps import masked_ce_sum
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)),
                         dtype=jnp.float32)
    y = jnp.asarray([0, 1, 2, 3, 0, 1, 2, 3], dtype=jnp.int32)
    full = masked_ce_sum(logits, y, jnp.ones(8))
    half = masked_ce_sum(logits, y, jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0],
                                                jnp.float32))
    manual = masked_ce_sum(logits[:4], y[:4], jnp.ones(4))
    assert half == pytest.approx(float(manual), rel=1e-6)
    assert float(full) > float(half)


def test_early_stopping():
    es = EarlyStopping(patience=2, trace_func=lambda *a: None)
    for loss in [1.0, 0.9, 0.95, 0.96]:
        es(loss)
    assert es.early_stop
    assert es.val_loss_min == 0.9


def test_rop_matches_torch():
    """ReduceLROnPlateau parity vs torch (rel threshold, patience reset)."""
    from mural_tpu.train.optim import ReduceLROnPlateau
    tsched_opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))],
                                 lr=1e-2)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        tsched_opt, mode="min", factor=0.2, patience=1, threshold=1e-4,
        min_lr=1e-7)
    ours = ReduceLROnPlateau(1e-2)
    # plateau, tiny sub-threshold improvements, then recovery
    metrics = [1.0, 0.9, 0.9, 0.9, 0.9, 0.89999, 0.89998, 0.5, 0.5,
               0.5, 0.5, 0.5]
    for m in metrics:
        tsched.step(m)
        lr = ours.step(m)
        assert lr == pytest.approx(tsched_opt.param_groups[0]["lr"],
                                   rel=1e-9), (m, lr)
