"""AUCM min-max semantics (VERDICT r1 item 4).

libauc's AUCMLoss is a min-max problem: PESG descends (w, a, b) and ASCENDS
the dual variable alpha.  ``ops.losses.aucm_loss`` implements the ascent via
a gradient-reversal identity on alpha, so one ordinary optimizer gives the
saddle dynamics.  These tests pin (1) convergence of (a, b, alpha) to their
analytic saddle under joint Adam, and (2) training dynamics: ``auc_clam``
improves window AUC on separable synthetic data while alpha rises toward its
saddle instead of diverging negative (which plain descent on the concave
``-p(1-p)alpha^2`` term would do).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from multimodal_fusion_tpu.models.factory import ModelFactory
from multimodal_fusion_tpu.ops.losses import aucm_loss
from test_model_zoo import make_case, make_gate_config


def test_aucm_saddle_point_under_joint_adam():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.standard_normal(64), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, 64))
    margin = 1.0
    params = {"a": jnp.zeros(()), "b": jnp.zeros(()), "alpha": jnp.zeros(())}
    tx = optax.adam(0.05)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        g = jax.grad(
            lambda p: aucm_loss(pred, y, p["a"], p["b"], p["alpha"], margin)
        )(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt

    for _ in range(800):
        params, opt = step(params, opt)

    pos = (np.asarray(y) == 1).astype(np.float64)
    p, q = pos.mean(), 1.0 - pos.mean()
    pr = np.asarray(pred, np.float64)
    # dL/dalpha = 0  =>  alpha* = margin + E[p m neg - q m pos] / (p q)
    alpha_star = margin + np.mean(p * pr * (1 - pos) - q * pr * pos) / (p * q)
    # dL/da = 0 => a* = class-1 mean margin; dL/db = 0 => b* = class-0 mean
    a_star = np.mean(pr * pos) / np.mean(pos)
    b_star = np.mean(pr * (1 - pos)) / np.mean(1 - pos)
    assert abs(float(params["alpha"]) - alpha_star) < 0.05
    assert abs(float(params["a"]) - a_star) < 0.05
    assert abs(float(params["b"]) - b_star) < 0.05


def _window_auc(margins, labels):
    pos = margins[labels == 1]
    neg = margins[labels == 0]
    return float(np.mean(pos[:, None] > neg[None, :]))


import pytest


@pytest.mark.parametrize("model_type", ["auc_clam", "gate_auc_mil"])
def test_auc_model_training_improves_auc(model_type):
    cfg = make_gate_config(model_type)
    cfg.dropout = 0.0
    model = ModelFactory.create_model(cfg, seed=0)
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)

    G = 8
    labels = np.array([0, 1] * (G // 2))
    cases = []
    for i, lab in enumerate(labels):
        case = make_case(seed=100 + i)
        case["channels"] = {
            k: v for k, v in case["channels"].items()
            if k in cfg.channels_used_in_model
        }
        case["masks"] = {
            k: v for k, v in case["masks"].items()
            if k in cfg.channels_used_in_model
        }
        shift = 1.0 if lab == 1 else -1.0
        case["channels"] = {
            k: (v + shift if k.endswith("features") else v)
            for k, v in case["channels"].items()
        }
        cases.append(case)
    window = {
        "channels": {
            k: jnp.stack([c["channels"][k] for c in cases])
            for k in cases[0]["channels"]
        },
        "masks": {
            k: jnp.stack([c["masks"][k] for c in cases]) for k in cases[0]["masks"]
        },
        "label": jnp.asarray(labels),
    }

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, keys):
        def loss_fn(params):
            def one(channels, masks, label, key):
                m = nnx.merge(graphdef, params, rest)
                res = m({"channels": channels, "masks": masks}, label, key=key, train=True)
                return m.loss_fn(res["logits"], label[None], res), res

            losses, results = jax.vmap(one)(
                window["channels"], window["masks"], window["label"], keys
            )
            m = nnx.merge(graphdef, params, rest)
            gr = dict(results)
            gr["label"] = window["label"]
            total = (jnp.sum(losses) + m.group_loss_fn(gr)) / G
            return total, results

        grads, results = jax.grad(loss_fn, has_aux=True)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, results

    key = jax.random.key(0)
    margins0 = None
    alpha_traj = []
    for step_i in range(60):
        key, sub = jax.random.split(key)
        params, opt, results = train_step(params, opt, jax.random.split(sub, G))
        m = np.asarray(results["logits"][:, 0, 1] - results["logits"][:, 0, 0])
        alpha_traj.append(float(params["auc_alpha"][...]))
        if margins0 is None:
            margins0 = m
    auc0 = _window_auc(margins0, labels)
    auc1 = _window_auc(m, labels)
    assert auc1 >= auc0
    assert auc1 >= 0.9
    # alpha ASCENDS while margins are small (saddle ~ +margin: at alpha=0,
    # dL/dalpha ~ 2*p*q*margin > 0, so ascent goes up; the old descent bug
    # drove it negative immediately).  As training separates the classes the
    # saddle alpha* = margin + E[p m neg - q m pos]/(pq) moves negative and
    # alpha tracks it back down — both phases are the min-max dynamics.
    alpha_traj = np.asarray(alpha_traj)
    # first Adam step moves ~ +lr under ascent, -lr under the descent bug
    assert alpha_traj[0] > 5e-4
    assert alpha_traj[:5].max() > 2e-3
    assert alpha_traj[:10].min() >= -1e-6
    pos = labels == 1
    p = pos.mean()
    q = 1.0 - p
    saddle_final = 1.0 + np.mean(p * m * ~pos - q * m * pos) / (p * q)
    if saddle_final < 0:  # separable: saddle went negative, alpha followed
        assert alpha_traj[-1] < alpha_traj.max()


def test_aucm_eval_group_loss_in_validation(tmp_path):
    """The reference adds ONE AUCM group loss over the whole validation set
    (trainer.py:906-912, the group_logits stash guard — AUCM models only);
    the eval summary must include it, and SVD models must NOT get theirs."""
    import numpy as np

    from multimodal_fusion_tpu.config import Configs, ExperimentConfig, ModelConfig
    from multimodal_fusion_tpu.data.multimodal import MultimodalDataset
    from multimodal_fusion_tpu.data.splits import create_k_fold_splits
    from multimodal_fusion_tpu.io.fixtures import make_synthetic_dataset
    from multimodal_fusion_tpu.train.survival import SurvivalTrainer

    root = tmp_path / "d"
    csv_path = make_synthetic_dataset(
        root, n_patients=12, seed=3, min_wsi_patches=8, max_wsi_patches=12,
        feature_dim=16,
    )
    ds = MultimodalDataset(csv_path, root, channels=["wsi=features"])
    splits = create_k_fold_splits(ds.labels, 3, seed=0)

    def eval_loss(model_type, **extra):
        mc = ModelConfig(
            model_type=model_type, n_classes=2, input_dim=16,
            model_size="16*8", output_dim=16,
            channels_used_in_model=["wsi=features"], **extra,
        )
        ec = ExperimentConfig(exp_name="ag", seed=0, k_folds=3, max_epochs=1,
                              batch_size=4, lr=1e-3)
        ec.extra["verbose"] = False
        tr = SurvivalTrainer(Configs(experiment_config=ec, model_config=mc),
                             tmp_path / model_type)
        tr.train_fold(ds, splits[0], 0)
        model, graphdef, params, rest = tr._build_model(0)
        from multimodal_fusion_tpu.train.checkpoint import load_state

        restored, _ = load_state(
            tmp_path / model_type / "s_0_checkpoint.npz",
            {"params": params, "rest": rest},
        )
        params, rest = restored["params"], restored["rest"]
        step = tr._make_eval_step(model, graphdef)
        import jax

        res_with = tr._evaluate(ds, splits[0].test_idx, step, params, rest,
                                jax.random.key(0))
        # same evaluation with the group hook disabled isolates the term
        step.group_eval = None
        res_without = tr._evaluate(ds, splits[0].test_idx, step, params, rest,
                                   jax.random.key(0))
        return res_with["loss"], res_without["loss"], model

    with_g, without_g, model = eval_loss("auc_clam")
    assert getattr(model, "stashes_group_logits", False)
    assert with_g != without_g  # AUCM group term included exactly once
    assert np.isfinite(with_g)
