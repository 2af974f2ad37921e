"""Reverse migration: models trained HERE go back to the reference stack.

``models/torch_export.py`` is the inverse of
``factory.import_reference_checkpoint``; these tests pin it three ways:

- round-trip: every shipped reference family's ckpt imports and re-exports
  to EXACTLY the original state_dict (key set and bytes);
- fresh-weights strict-load + forward parity: a quadrimodal CLIP (ConvMixer
  tower + meta encoder + attn aggregation), a supervised classification
  head, a masked pretrainer, and a ClipMLP initialised in THIS framework
  export into the reference's REAL torch classes (tests/ref_modules.py)
  via ``load_state_dict`` at its default strict=True — missing/unexpected/
  mis-shaped keys fail loudly — and both stacks produce identical outputs
  on identical inputs (models_multimodal.py:203-273 forward);
- run-dir export: one of our trained run directories becomes a tree the
  reference's own ``initialize_model``/``load_config``
  (models_multimodal.py:559-680) consumes directly.
"""

import glob
import os

import numpy as np
import pytest

REF = "/root/reference"
ROOT = os.path.join(REF, "models")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference not mounted"
)


# ---------------------------------------------------------------- round-trip

def _runs_with_ckpt(family):
    out = []
    fam_dir = os.path.join(ROOT, family)
    for run in sorted(os.listdir(fam_dir)):
        rd = os.path.join(fam_dir, run)
        cks = [c for c in glob.glob(os.path.join(rd, "*.ckpt"))
               if os.path.exists(c)]
        if os.path.isdir(rd) and cks:
            out.append(rd)
    return out


FAMILIES = sorted(
    f for f in (os.listdir(ROOT) if os.path.isdir(ROOT) else [])
    if os.path.isdir(os.path.join(ROOT, f)) and _runs_with_ckpt(f)
)


@pytest.mark.parametrize("family", FAMILIES)
def test_roundtrip_reference_family(family):
    """import -> export reproduces the shipped state_dict exactly: same key
    set, same shapes, same bytes (every transform in the exporter is the
    inverse of one in the importer)."""
    import torch

    from multimodal_supernovae_tpu.models.factory import (
        _pick_reference_ckpt,
        import_reference_checkpoint,
    )
    from multimodal_supernovae_tpu.models.torch_export import (
        export_reference_state_dict,
    )

    ckpt = _pick_reference_ckpt(_runs_with_ckpt(family)[0], "best")
    orig = {
        k: v.numpy()
        for k, v in torch.load(ckpt, map_location="cpu",
                               weights_only=False)["state_dict"].items()
    }
    params = import_reference_checkpoint(ckpt)
    stats = params.pop("__batch_stats__", None)
    exported = export_reference_state_dict(params, stats)

    assert set(exported) == set(orig), (
        set(exported) ^ set(orig))
    for k in orig:
        got, want = np.asarray(exported[k]), orig[k]
        assert got.shape == want.shape, k
        np.testing.assert_array_equal(got, want, err_msg=k)


# ------------------------------------------------- fresh-weights strict load

def _seq_kwargs(agg):
    return {"n_out": 6, "emb": 8, "heads": 2, "depth": 2,
            "time_norm": 1000.0, "agg": agg, "dropout": 0.0}


CONV_KWARGS = {"dim": 8, "depth": 2, "channels": 3, "kernel_size": 3,
               "patch_size": 10, "n_out": 6, "dropout_prob": 0.0}
META_KWARGS = {"input_dim": 8, "hidden_dim": 8, "num_layers": 2,
               "dropout": 0.0}
COMBOS = ("host_galaxy", "lightcurve", "spectral", "meta")


def _our_clip(**kw):
    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel

    cfg = CLIPConfig.create(
        combinations=COMBOS, enc_dim=4, nband=2,
        transformer_kwargs=_seq_kwargs("attn"),
        transformer_spectral_kwargs=_seq_kwargs("mean"),
        conv_kwargs=CONV_KWARGS, meta_kwargs=META_KWARGS,
        loss="softmax", use_pallas=False, **kw,
    )
    return CLIPModel(cfg)


def _ref_clip(**kw):
    from ref_modules import load_reference_models

    ref = load_reference_models()
    return ref.LightCurveImageCLIP(
        enc_dim=4, logit_scale=10.0, nband=2,
        transformer_kwargs=_seq_kwargs("attn"),
        transformer_spectral_kwargs=_seq_kwargs("mean"),
        conv_kwargs=CONV_KWARGS, meta_kwargs=META_KWARGS,
        combinations=list(COMBOS), loss="softmax", **kw,
    )


def _quad_inputs(rng, b=4, t=10, s=8):
    x_lc = rng.normal(size=(b, t)).astype(np.float32)
    t_lc = (rng.random((b, t)) * 50).astype(np.float32)
    m_lc = rng.random((b, t)) > 0.25
    m_lc[:, 0] = True
    x_sp = rng.normal(size=(b, s)).astype(np.float32)
    t_sp = np.linspace(3000, 9000, s, dtype=np.float32)[None].repeat(b, 0)
    m_sp = np.ones((b, s), dtype=bool)
    img = rng.random((b, 20, 20, 3)).astype(np.float32)
    z = rng.random(b).astype(np.float32)
    label = rng.integers(0, 5, b).astype(np.int32)
    return x_lc, t_lc, m_lc, x_sp, t_sp, m_sp, img, z, label


def _our_batch(inputs):
    from multimodal_supernovae_tpu.data.batching import Batch

    x_lc, t_lc, m_lc, x_sp, t_sp, m_sp, img, z, label = inputs
    return Batch(
        x_lc=x_lc, t_lc=t_lc, mask_lc=m_lc, err_lc=np.zeros_like(x_lc),
        x_sp=x_sp, t_sp=t_sp, mask_sp=m_sp, err_sp=np.zeros_like(x_sp),
        x_img=img, redshift=z, label=label,
    )


def _ref_forward(rmodel, inputs):
    import torch

    x_lc, t_lc, m_lc, x_sp, t_sp, m_sp, img, z, label = inputs
    rmodel.eval()
    with torch.no_grad():
        out = rmodel(
            torch.tensor(np.transpose(img, (0, 3, 1, 2))),  # NHWC -> NCHW
            torch.tensor(x_lc), torch.tensor(t_lc), torch.tensor(m_lc),
            torch.tensor(x_sp), torch.tensor(t_sp), torch.tensor(m_sp),
            redshift=torch.tensor(z),
            classification=torch.tensor(label.astype(np.int64)),
        )
    if isinstance(out, list):
        return [o.numpy() for o in out]
    return out.numpy()


def _strict_load(rmodel, path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)["state_dict"]
    rmodel.load_state_dict(sd)  # strict=True: any key/shape skew raises
    return rmodel


def test_quadrimodal_export_strict_load_forward_parity(rng, tmp_path):
    """Fresh quadrimodal CLIP weights (ConvMixer tower + BatchNorm stats +
    meta encoder + attn aggregation + packed MultiheadAttention) export into
    the reference's LightCurveImageCLIP and yield identical embeddings."""
    import jax

    from multimodal_supernovae_tpu.models.torch_export import (
        export_reference_checkpoint,
    )

    model = _our_clip()
    inputs = _quad_inputs(rng)
    batch = _our_batch(inputs)
    variables = model.init(jax.random.PRNGKey(0), batch)
    ours = [np.asarray(e) for e in model.apply(variables, batch)]

    path = str(tmp_path / "quad.ckpt")
    export_reference_checkpoint(
        variables["params"], path, batch_stats=variables["batch_stats"])
    want = _ref_forward(_strict_load(_ref_clip(), path), inputs)

    assert len(ours) == len(want) == 4
    for g, w in zip(ours, want):  # host_galaxy, lightcurve, spectral, meta
        np.testing.assert_allclose(g, w, rtol=2e-5, atol=2e-5)


def test_supervised_export_strict_load_logit_parity(rng, tmp_path):
    """Classification head: the exported ``linear`` weights drive the
    reference's supervised forward (models_multimodal.py:228-260) to the
    same logits."""
    import jax

    from multimodal_supernovae_tpu.models.torch_export import (
        export_reference_checkpoint,
    )

    model = _our_clip(classification=True, n_classes=5)
    inputs = _quad_inputs(rng)
    batch = _our_batch(inputs)
    variables = model.init(jax.random.PRNGKey(0), batch)
    ours = np.asarray(model.apply(variables, batch))

    path = str(tmp_path / "cls.ckpt")
    export_reference_checkpoint(
        variables["params"], path, batch_stats=variables["batch_stats"])
    want = _ref_forward(
        _strict_load(_ref_clip(classification=True, n_classes=5), path),
        inputs)
    assert ours.shape == want.shape == (4, 5)
    np.testing.assert_allclose(ours, want, rtol=2e-5, atol=2e-5)


def test_masked_encoder_export_strict_load_parity(rng, tmp_path):
    """Fresh MaskedLightCurveEncoder weights strict-load into the
    reference's module (src/models_pretraining.py:101-166) — including the
    synthesized dead ``net.projection.*`` keys its unconditional constructor
    demands — and reconstruct identically."""
    import torch

    import jax

    from multimodal_supernovae_tpu.data.batching import Batch
    from multimodal_supernovae_tpu.models.pretraining import (
        MaskedEncoderConfig,
        MaskedLightCurveEncoder,
    )
    from multimodal_supernovae_tpu.models.torch_export import (
        export_reference_checkpoint,
    )
    from ref_modules import load_reference_pretraining

    tk = {"n_out": 6, "emb": 8, "heads": 2, "depth": 2, "dropout": 0.0,
          "time_norm": 1000.0}
    model = MaskedLightCurveEncoder(
        MaskedEncoderConfig.create(f_mask=0.2, nband=2, transformer_kwargs=tk))
    x_lc, t_lc, m_lc, *_ = _quad_inputs(rng)
    batch = Batch(x_lc=x_lc, t_lc=t_lc, mask_lc=m_lc,
                  err_lc=np.zeros_like(x_lc))
    variables = model.init(jax.random.PRNGKey(0), batch)
    ours = np.asarray(model.apply(variables, batch))

    path = str(tmp_path / "masked.ckpt")
    export_reference_checkpoint(variables["params"], path, n_out=tk["n_out"])

    refmod = load_reference_pretraining()
    oracle = refmod.MaskedLightCurveEncoder(
        f_mask=0.2, nband=2, transformer_kwargs=tk)
    _strict_load(oracle, path)
    oracle.eval()
    with torch.no_grad():
        want = oracle(
            torch.tensor(x_lc), torch.tensor(t_lc), torch.tensor(m_lc)
        ).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-5, atol=2e-5)


def test_clip_mlp_export_strict_load_parity(rng, tmp_path):
    """ClipMLP head: exported ``clip_model.* + mlp_model.*`` keys strict-load
    into the reference's ClipMLP (models_multimodal.py:859-922) and predict
    identically."""
    import torch

    import jax

    from multimodal_supernovae_tpu.models import CLIPConfig
    from multimodal_supernovae_tpu.models.clip_mlp import (
        ClipMLPConfig,
        ClipMLPHead,
    )
    from multimodal_supernovae_tpu.models.torch_export import (
        export_reference_checkpoint,
    )
    from ref_modules import load_reference_models

    combos = ("lightcurve", "spectral")
    clip_cfg = CLIPConfig.create(
        combinations=combos, enc_dim=4, nband=2,
        transformer_kwargs=_seq_kwargs("mean"),
        transformer_spectral_kwargs=_seq_kwargs("mean"),
        loss="softmax", use_pallas=False,
    )
    model = ClipMLPHead(ClipMLPConfig(
        clip=clip_cfg, combinations=combos, hidden_dim=8, num_layers=2,
        regression=True))
    inputs = _quad_inputs(rng)
    batch = _our_batch(inputs)
    variables = model.init(jax.random.PRNGKey(0), batch)
    ours = np.asarray(model.apply(variables, batch))

    path = str(tmp_path / "clipmlp.ckpt")
    export_reference_checkpoint(variables["params"], path)

    ref = load_reference_models()
    backbone = ref.LightCurveImageCLIP(
        enc_dim=4, logit_scale=10.0, nband=2,
        transformer_kwargs=_seq_kwargs("mean"),
        transformer_spectral_kwargs=_seq_kwargs("mean"),
        combinations=list(combos), loss="softmax",
    )
    oracle = ref.ClipMLP(
        clip_model=backbone,
        mlp_kwargs={"hidden_dim": 8, "num_layers": 2, "dropout": 0.0,
                    "output_dim": 1},
        optimizer_kwargs={}, lr=1e-3, combinations=list(combos),
        regression=True)
    _strict_load(oracle, path)
    oracle.eval()
    x_lc, t_lc, m_lc, x_sp, t_sp, m_sp, *_ = inputs
    with torch.no_grad():
        want = oracle(
            torch.tensor(x_lc), torch.tensor(t_lc), torch.tensor(m_lc),
            torch.tensor(x_sp), torch.tensor(t_sp), torch.tensor(m_sp),
        ).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-5, atol=2e-5)


def test_vit_tower_export_rejected(rng):
    """The ViT image tower has no reference counterpart: exporting must fail
    loudly, never silently drop the tower."""
    import jax

    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
    from multimodal_supernovae_tpu.models.torch_export import (
        export_reference_state_dict,
    )

    cfg = CLIPConfig.create(
        combinations=("host_galaxy", "lightcurve"), enc_dim=4, nband=2,
        transformer_kwargs=_seq_kwargs("mean"),
        image_encoder="vit",
        vit_kwargs={"patch_size": 10, "emb": 8, "depth": 1, "heads": 2,
                    "n_out": 6},
        use_pallas=False,
    )
    model = CLIPModel(cfg)
    inputs = _quad_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), _our_batch(inputs))
    with pytest.raises(ValueError, match="vit"):
        export_reference_state_dict(variables["params"],
                                    variables.get("batch_stats"))


# ------------------------------------------------------------ run-dir export

@pytest.fixture(scope="module")
def trained_run_dir(tmp_path_factory):
    """One smoke-config fit (enc_dim forced to 128 — the only width the
    reference's initialize_model can rebuild, models_multimodal.py:657)."""
    import yaml

    from multimodal_supernovae_tpu.config import load_sweep
    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.training.experiment import (
        make_sweep_dir,
        run_sweep,
    )

    root = tmp_path_factory.mktemp("torch_export_run")
    smoke = os.path.join(os.path.dirname(__file__), "..", "configs",
                         "smoke.yaml")
    with open(smoke) as f:
        raw = yaml.safe_load(f)
    raw["parameters"]["enc_dim"]["values"] = [128]
    cfg_path = str(root / "smoke128.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)
    sweep = load_sweep(cfg_path)
    sweep_dir = make_sweep_dir(sweep, str(root), "exp")
    ds = make_synthetic_dataset(n=24, n_max_lc=8, nband=2, n_max_sp=32,
                                seed=0)
    results = run_sweep(sweep, ds, nband=2, folds=None, sweep_dir=sweep_dir)
    return results[0]["run_dir"]


def test_export_run_dir_to_reference(trained_run_dir, tmp_path):
    """Full migration loop: train a run HERE, export the run dir, and the
    reference's own initialize_model/load_config consume it (sweep sidecar
    one level up, config.yaml + strict-loading ckpt inside)."""
    import torch

    from multimodal_supernovae_tpu.models.torch_export import (
        export_run_dir_to_reference,
    )
    from ref_modules import load_reference_models

    run_dir = trained_run_dir
    out_dir = str(tmp_path / "ref_tree" / "exported-run")
    ckpt = export_run_dir_to_reference(run_dir, out_dir, which="best")

    assert os.path.exists(os.path.join(out_dir, "config.yaml"))
    assert os.path.exists(os.path.join(out_dir, "train_filenames.txt"))
    assert os.path.exists(
        os.path.join(str(tmp_path / "ref_tree"), "sweep_config.yaml"))

    ref = load_reference_models()
    rmodel, combinations, regression, classification, *_ = (
        ref.initialize_model(ckpt))
    assert sorted(combinations) == ["lightcurve", "spectral"]
    assert not regression and not classification
    sd = torch.load(ckpt, map_location="cpu",
                    weights_only=False)["state_dict"]
    rmodel.load_state_dict(sd)  # strict

    # the trained logit scale survives the loop
    from multimodal_supernovae_tpu.models.factory import (
        import_reference_checkpoint,
    )

    back = import_reference_checkpoint(ckpt)
    assert np.isfinite(float(back["logit_scale"]))


@pytest.mark.slow
def test_export_torch_cli(trained_run_dir, tmp_path):
    """scripts/export_torch.py end-to-end: the CLI writes a tree whose ckpt
    the reference's load path consumes."""
    import subprocess
    import sys as _sys

    import torch

    from ref_modules import load_reference_models

    out_dir = str(tmp_path / "cli_tree" / "run-0")
    repo = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "export_torch.py"),
         trained_run_dir, "--out", out_dir],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    cks = glob.glob(os.path.join(out_dir, "*.ckpt"))
    assert len(cks) == 1

    ref = load_reference_models()
    rmodel = ref.initialize_model(cks[0])[0]
    sd = torch.load(cks[0], map_location="cpu",
                    weights_only=False)["state_dict"]
    rmodel.load_state_dict(sd)  # strict
