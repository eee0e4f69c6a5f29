"""LR schedules vs torch's schedulers (epoch-indexed parity)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from multimodal_fusion_tpu.train.optim import LRSchedule, make_optimizer

BASE = 0.01


def _torch_lrs(sched_factory, epochs):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=BASE)
    sched = sched_factory(opt)
    out = []
    for _ in range(epochs):
        out.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return out


def test_step_lr():
    want = _torch_lrs(lambda o: torch.optim.lr_scheduler.StepLR(o, 5, 0.5), 20)
    s = LRSchedule(BASE, {"type": "step", "step_size": 5, "gamma": 0.5})
    got = [s.lr_for_epoch(e) for e in range(20)]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cosine_lr():
    want = _torch_lrs(
        lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(o, T_max=10, eta_min=1e-4), 10
    )
    s = LRSchedule(BASE, {"type": "cosine", "T_max": 10, "eta_min": 1e-4})
    got = [s.lr_for_epoch(e) for e in range(10)]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_warm_restart_lr():
    want = _torch_lrs(
        lambda o: torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(o, T_0=4, T_mult=2), 20
    )
    s = LRSchedule(BASE, {"type": "cosine_warm_restart", "T_0": 4, "T_mult": 2, "eta_min": 0.0})
    got = [s.lr_for_epoch(e) for e in range(20)]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_exponential_lr():
    want = _torch_lrs(lambda o: torch.optim.lr_scheduler.ExponentialLR(o, 0.9), 15)
    s = LRSchedule(BASE, {"type": "exponential", "gamma": 0.9})
    got = [s.lr_for_epoch(e) for e in range(15)]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_plateau_lr():
    s = LRSchedule(BASE, {"type": "plateau", "patience": 2, "factor": 0.5, "mode": "min"})
    losses = [1.0, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9]
    lrs = []
    for l in losses:
        lrs.append(s.lr_for_epoch(0))
        s.plateau_step(l)
    # patience=2: reduction fires after the 3rd non-improving epoch
    assert lrs[0] == BASE
    assert lrs[-1] == BASE * 0.5


def test_adam_matches_torch_coupled_l2():
    """Our optax chain == torch.optim.Adam with weight_decay (coupled L2)."""
    import jax
    import jax.numpy as jnp
    import optax

    w0 = np.random.default_rng(0).standard_normal(6).astype(np.float32)
    g = np.random.default_rng(1).standard_normal(6).astype(np.float32)
    lr, wd = 1e-3, 1e-2

    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([p], lr=lr, weight_decay=wd)
    for _ in range(5):
        opt.zero_grad()
        p.grad = torch.tensor(g.copy())
        opt.step()
    want = p.detach().numpy()

    tx = make_optimizer("adam", wd)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for _ in range(5):
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, jax.tree.map(lambda u: -lr * u, updates))
    np.testing.assert_allclose(np.asarray(params), want, rtol=1e-5, atol=1e-6)
