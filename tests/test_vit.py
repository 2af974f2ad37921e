"""ViT image tower (TPU-first extension; no reference counterpart).

Covers: forward shapes/jit, gradient flow, dropout determinism switch,
drop-in use as the CLIP image encoder via CLIPConfig(image_encoder='vit'),
and the config-layer plumbing (extra_args.image_encoder).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_supernovae_tpu.config.config import build_clip_config
from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel, ViT

from tests.test_clip_model import tiny_cfg, tiny_batch


def test_vit_forward_shape_and_jit(rng):
    model = ViT(emb=16, depth=2, heads=2, patch_size=5, n_out=12)
    x = jnp.array(rng.random((4, 20, 20, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    assert out.shape == (4, 12)
    assert np.isfinite(np.asarray(out)).all()
    # token count = (20/5)^2 = 16
    assert variables["params"]["pos_emb"].shape == (1, 16, 16)


def test_vit_rejects_indivisible_image():
    model = ViT(emb=16, depth=1, heads=2, patch_size=6)
    x = jnp.zeros((2, 20, 20, 3))
    with pytest.raises(AssertionError):
        model.init(jax.random.PRNGKey(0), x)


def test_vit_gradients_flow_everywhere(rng):
    model = ViT(emb=16, depth=2, heads=2, patch_size=5, n_out=4)
    x = jnp.array(rng.random((2, 10, 10, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return (model.apply({"params": params}, x) ** 2).sum()

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    assert flat
    for path, g in flat:
        assert np.abs(np.asarray(g)).sum() > 0, (
            f"zero gradient at {jax.tree_util.keystr(path)}"
        )


def test_vit_dropout_train_vs_eval(rng):
    model = ViT(emb=16, depth=1, heads=2, patch_size=5, dropout_prob=0.5)
    x = jnp.array(rng.random((2, 10, 10, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    # eval: deterministic without rngs
    a = model.apply(variables, x, train=False)
    b = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # train: needs the dropout rng and perturbs the output
    c = model.apply(variables, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_clip_with_vit_image_tower(rng):
    cfg = tiny_cfg(
        combinations=("host_galaxy", "lightcurve"),
        image_encoder="vit",
        vit_kwargs={"emb": 16, "depth": 1, "heads": 2, "patch_size": 5,
                    "n_out": 6},
    )
    model = CLIPModel(cfg)
    batch = tiny_batch(rng, with_img=True)
    variables = model.init(jax.random.PRNGKey(0), batch)
    # no BatchNorm: a ViT tower must not create a batch_stats collection
    assert "batch_stats" not in variables
    embs = model.apply(variables, batch)
    assert len(embs) == 2 and embs[0].shape == (4, 4)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(embs[0]), axis=-1), 1.0, rtol=1e-5
    )

    loss, aux = model.apply(variables, batch, method=model.loss_fn)
    assert np.isfinite(float(loss))


def test_convmixer_default_unchanged(rng):
    cfg = tiny_cfg(combinations=("host_galaxy", "lightcurve"))
    model = CLIPModel(cfg)
    batch = tiny_batch(rng, with_img=True)
    variables = model.init(jax.random.PRNGKey(0), batch)
    # ConvMixer keeps its BatchNorm running stats — the reference-parity tower
    assert "batch_stats" in variables


def test_config_layer_selects_vit():
    run_cfg = {"n_out": 6, "emb": 8, "heads": 2, "transformer_depth": 1,
               "vit_emb": 24, "vit_depth": 2, "vit_heads": 4}
    extra = {"combinations": ["host_galaxy", "lightcurve"],
             "image_encoder": "vit"}
    cfg = build_clip_config(run_cfg, extra)
    assert cfg.image_encoder == "vit"
    vk = cfg.vk()
    assert vk["emb"] == 24 and vk["depth"] == 2 and vk["heads"] == 4
    assert vk["n_out"] == 6
    # default stays convmixer when extra_args omits the key
    cfg2 = build_clip_config(run_cfg, {"combinations": ["host_galaxy"]})
    assert cfg2.image_encoder == "convmixer"


def test_vit_attention_dispatch_resolution(rng):
    """A model-wide use_pallas=True must not FORCE the flash kernel in the
    ViT tower (its token count is far below the kernel's payoff range; at
    t=36 the forced call used to fail remote Mosaic compile) — the tower
    auto-dispatches per shape. On CPU an inherited True would attempt an
    uncompileable pallas_call; auto picks dense. The explicit
    use_pallas=False kill-switch and a vit_kwargs override must both
    reach the tower (models/clip.py)."""
    vk = {"emb": 16, "depth": 1, "heads": 2, "patch_size": 5, "n_out": 6}
    batch = tiny_batch(rng, with_img=True)
    for kw in (
        dict(use_pallas=True, vit_kwargs=vk),   # global True -> tower auto
        dict(use_pallas=False, vit_kwargs=vk),  # kill-switch -> tower dense
        dict(vit_kwargs={**vk, "use_pallas": False}),  # explicit override
    ):
        cfg = tiny_cfg(
            combinations=("host_galaxy", "lightcurve"),
            image_encoder="vit", **kw,
        )
        model = CLIPModel(cfg)
        variables = model.init(jax.random.PRNGKey(0), batch)
        embs = model.apply(variables, batch)
        assert np.isfinite(np.asarray(embs[0])).all()


def test_unknown_image_encoder_rejected(rng):
    cfg = tiny_cfg(combinations=("host_galaxy", "lightcurve"),
                   image_encoder="ViT")  # wrong case: must not fall back
    batch = tiny_batch(rng, with_img=True)
    with pytest.raises(ValueError, match="image_encoder"):
        CLIPModel(cfg).init(jax.random.PRNGKey(0), batch)


def test_config_layer_plumbs_vit_use_pallas():
    run_cfg = {"n_out": 6, "emb": 8, "heads": 2, "transformer_depth": 1}
    extra = {"combinations": ["host_galaxy"], "image_encoder": "vit",
             "vit_use_pallas": False}
    cfg = build_clip_config(run_cfg, extra)
    assert cfg.vk()["use_pallas"] is False
    # absent key -> no entry, the model resolves auto/kill-switch itself
    cfg2 = build_clip_config(run_cfg, {"combinations": ["host_galaxy"],
                                       "image_encoder": "vit"})
    assert "use_pallas" not in cfg2.vk()
