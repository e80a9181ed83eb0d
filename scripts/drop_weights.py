"""Weights-drop readiness: convert pretrained weights + run the parity gate.

The reference auto-downloads its pretrained artifacts (DeepSentibank
caffemodel: featurizer/sbpycaffe_img_featurizer.py:1-6,57-67; dlib face
ResNet: featurizer/dlib_featurizer.py:1-47) and validates deployments by
re-computing a stored feature and checking the norm of the difference
(reference method: cufacesearch/tests/test_compare_sbcmdlinetf.py:1-40).
This environment has zero egress, so this script is the single documented
command to run THE MOMENT a weights artifact is provisioned:

    # DeepSentibank (either a caffe-blob npz exported with pycaffe --
    # keys conv1..conv5, fc6, fc7, fc8-t, each a (W, b) pair as W+".w"/".b"
    # arrays -- or a torch state-dict .pt, or an already-converted flat npz)
    python scripts/drop_weights.py --sentibank /path/sentibank_blobs.npz \
        [--stored-feats /path/stored.npz]

    # dlib face ResNet (npz with con0..con28 [out,in,kh,kw], affine<i>_g /
    # affine<i>_b pairs, fc [256,128] -- exported from dlib with the
    # snippet in docs/PARITY.md)
    python scripts/drop_weights.py --dlib-face /path/dlib_blobs.npz

    # end-to-end dry run with synthetic weights (no artifacts needed)
    python scripts/drop_weights.py --dry-run

Steps per model: convert -> save to the conventional auto-load path ->
recompute features on the bundled image -> gate:
  * if --stored-feats gives a reference feature (key ``sentibank`` /
    ``dlib_face``), assert ||stored - recomputed|| per the reference test;
  * always: finiteness, non-zero norm, batch-vs-single consistency.
Exit code 0 = the drop is live and parity-gated.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SAMPLE_IMG = os.path.join(REPO, "tests", "data", "grace_hopper.jpg")
# The reference's de-facto pass bound: it prints the diff norm and treats
# ~0 as pass; stored features are L2-normalized (featsio.py:13-22), so 1e-3
# on a unit vector is far below any real-weight mismatch signature.
NORM_TOL = 1e-3


def log(msg):
    print(f"[drop_weights] {msg}", file=sys.stderr, flush=True)


# ------------------------------------------------------------- sentibank

def load_sentibank_any(path):
    """Accept a caffe-blob npz, a flat converted npz, or a torch .pt."""
    from columbiaimagesearch_tpu.models.sentibank import (
        load_caffe_weights,
        load_torch_weights,
        load_weights_npz,
    )

    if path.endswith((".pt", ".pth")):
        import torch

        return load_torch_weights(torch.load(path, map_location="cpu",
                                             weights_only=True))
    with np.load(path) as z:
        files = set(z.files)
        if any("/" in f for f in files):          # already-converted flat npz
            pass
        elif "conv1.w" in files:                  # caffe blob export
            blobs = {}
            for name in ["conv1", "conv2", "conv3", "conv4", "conv5",
                         "fc6", "fc7", "fc8-t"]:
                blobs[name] = (z[f"{name}.w"], z[f"{name}.b"])
            return load_caffe_weights(blobs)
        else:
            raise SystemExit(
                f"unrecognized sentibank npz keys: {sorted(files)[:6]}...")
    return load_weights_npz(path)


def gate_sentibank(weights_path, stored_feats):
    from columbiaimagesearch_tpu.extraction.featsio import featB64decode
    from columbiaimagesearch_tpu.models.sentibank import (
        SentibankFeaturizer,
        default_weights_path,
        save_weights_npz,
    )

    params = load_sentibank_any(weights_path)
    out = default_weights_path()
    save_weights_npz(params, out)
    log(f"sentibank: converted + saved -> {out}")

    fz = SentibankFeaturizer()           # auto-loads the dropped weights
    assert fz.pretrained, "featurizer did not pick up the dropped weights"
    with open(SAMPLE_IMG, "rb") as f:
        buf = f.read()
    feats, status = fz.featurize_buffers([buf])
    assert int(status[0]) == 0, f"sample image failed to decode: {status}"
    feat = feats[0]
    assert np.all(np.isfinite(feat)), "non-finite fc7"
    assert np.linalg.norm(feat) > 0, "zero fc7"
    batch, _ = fz.featurize_buffers([buf, buf, buf])
    assert np.allclose(batch[0], batch[2], atol=1e-3), \
        "batch position changes the feature"

    if stored_feats is not None and "sentibank" in stored_feats:
        stored = stored_feats["sentibank"]
        if stored.dtype.kind in "SU":    # b64 cell exactly as HBase stores it
            stored = featB64decode(stored.item(), "sbpycaffe")
        rec = feat / max(np.linalg.norm(feat), 1e-12)
        diff = float(np.linalg.norm(stored.astype(np.float32) - rec))
        log(f"sentibank stored-vs-recomputed ||diff|| = {diff:.2e} "
            f"(reference method test_compare_sbcmdlinetf.py)")
        assert diff < NORM_TOL, f"sentibank parity FAILED: {diff}"
    else:
        log("sentibank: no stored feature provided; structural gate only")
    log("sentibank: GATE PASSED")


# ------------------------------------------------------------- dlib face

def load_dlib_any(path):
    from columbiaimagesearch_tpu.models.face_dlib import (
        BLOCKS,
        load_dlib_weights,
        load_params_npz,
    )

    with np.load(path) as z:
        files = set(z.files)
        if "stem/w" in files:                     # already converted
            pass
        elif "con0" in files:                     # dlib blob export
            blobs = {}
            n_conv = 1 + 2 * len(BLOCKS)
            for i in range(n_conv):
                blobs[f"con{i}"] = z[f"con{i}"]
                blobs[f"affine{i}"] = (z[f"affine{i}_g"], z[f"affine{i}_b"])
            blobs["fc"] = z["fc"]
            return load_dlib_weights(blobs)
        else:
            raise SystemExit(
                f"unrecognized dlib npz keys: {sorted(files)[:6]}...")
    return load_params_npz(path)


def gate_dlib(weights_path, stored_feats):
    from columbiaimagesearch_tpu.models.face_dlib import (
        DlibExactFaceEmbedder,
        default_weights_path,
        save_params_npz,
    )

    params = load_dlib_any(weights_path)
    out = default_weights_path()
    save_params_npz(params, out)
    log(f"dlib face: converted + saved -> {out}")

    emb = DlibExactFaceEmbedder()        # auto-loads the dropped weights
    assert emb.pretrained, "embedder did not pick up the dropped weights"
    from PIL import Image

    img = np.asarray(Image.open(SAMPLE_IMG).convert("RGB"))
    bbox = {"left": 175, "top": 140, "right": 360, "bottom": 380}
    feat = np.asarray(emb.featurize(img, bbox))
    assert feat.shape == (128,), feat.shape
    assert feat.dtype == np.float64, feat.dtype   # reference contract
    assert np.all(np.isfinite(feat)) and np.linalg.norm(feat) > 0

    if stored_feats is not None and "dlib_face" in stored_feats:
        stored = np.asarray(stored_feats["dlib_face"], dtype=np.float64)
        rec = feat / max(np.linalg.norm(feat), 1e-12)
        diff = float(np.linalg.norm(stored - rec))
        log(f"dlib stored-vs-recomputed ||diff|| = {diff:.2e}")
        assert diff < NORM_TOL, f"dlib parity FAILED: {diff}"
    else:
        log("dlib face: no stored feature provided; structural gate only")
    log("dlib face: GATE PASSED")


# --------------------------------------------------------------- dry run

def dry_run(tmpdir):
    """Synthesize random blob files in both drop formats and run the full
    convert->save->load->featurize->gate path against self-recorded
    features (proves the machinery end-to-end without real artifacts)."""
    from columbiaimagesearch_tpu.models import face_dlib, sentibank

    rng = np.random.RandomState(0)

    # Sentibank caffe-blob npz (tiny-but-correct shapes come from the
    # layer map itself: build from the real init then re-export).
    params = sentibank.init_params(seed=0)
    blobs = {}
    for caffe_name, flax_name in sentibank._CAFFE_LAYER_MAP.items():
        k = np.asarray(params[flax_name]["kernel"])
        b = np.asarray(params[flax_name]["bias"])
        if caffe_name.startswith("conv"):
            w = np.transpose(k, (3, 2, 0, 1))     # HWIO -> [out,in/g,kh,kw]
        else:
            w = k.T
        blobs[f"{caffe_name}.w"] = w + 0.001 * rng.randn(*w.shape)
        blobs[f"{caffe_name}.b"] = b
    sb_path = os.path.join(tmpdir, "sentibank_blobs.npz")
    np.savez(sb_path, **blobs)

    dl_params = face_dlib.init_params(seed=0)
    dblobs = {"fc": np.asarray(dl_params["fc"])}
    dblobs["con0"] = np.transpose(np.asarray(dl_params["stem"]["w"]),
                                  (3, 2, 0, 1))
    dblobs["affine0_g"] = np.asarray(dl_params["stem"]["g"])
    dblobs["affine0_b"] = np.asarray(dl_params["stem"]["b"])
    ci = 1
    for blk in dl_params["blocks"]:
        for j, (wk, gk, bk) in enumerate((("w1", "g1", "b1"),
                                          ("w2", "g2", "b2"))):
            dblobs[f"con{ci + j}"] = np.transpose(np.asarray(blk[wk]),
                                                  (3, 2, 0, 1))
            dblobs[f"affine{ci + j}_g"] = np.asarray(blk[gk])
            dblobs[f"affine{ci + j}_b"] = np.asarray(blk[bk])
        ci += 2
    dl_path = os.path.join(tmpdir, "dlib_blobs.npz")
    np.savez(dl_path, **dblobs)

    # Redirect the conventional paths into the tmpdir for the dry run.
    os.environ[sentibank.WEIGHTS_ENV] = os.path.join(tmpdir, "sb.npz")
    os.environ[face_dlib.WEIGHTS_ENV] = os.path.join(tmpdir, "dl.npz")
    gate_sentibank(sb_path, None)
    gate_dlib(dl_path, None)

    # Second pass WITH stored features (self-recorded): the parity branch.
    from columbiaimagesearch_tpu.models.sentibank import SentibankFeaturizer

    fz = SentibankFeaturizer()
    with open(SAMPLE_IMG, "rb") as f:
        feat = fz.featurize_buffers([f.read()])[0][0]
    from PIL import Image

    emb = face_dlib.DlibExactFaceEmbedder()
    img = np.asarray(Image.open(SAMPLE_IMG).convert("RGB"))
    dfeat = np.asarray(emb.featurize(
        img, {"left": 175, "top": 140, "right": 360, "bottom": 380}))
    stored_path = os.path.join(tmpdir, "stored.npz")
    np.savez(stored_path,
             sentibank=feat / np.linalg.norm(feat),
             dlib_face=dfeat / np.linalg.norm(dfeat))
    stored = dict(np.load(stored_path))
    gate_sentibank(sb_path, stored)
    gate_dlib(dl_path, stored)
    log("dry run: all gates exercised end-to-end")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sentibank", help="sentibank weights artifact")
    ap.add_argument("--dlib-face", help="dlib face-resnet weights artifact")
    ap.add_argument("--stored-feats",
                    help="npz with keys 'sentibank'/'dlib_face': features "
                         "your existing deployment stored for "
                         "tests/data/grace_hopper.jpg (L2-normalized)")
    ap.add_argument("--dry-run", action="store_true",
                    help="exercise the whole path with synthetic weights")
    ap.add_argument("--cpu", action="store_true",
                    help="pin jax to CPU")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.dry_run:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            dry_run(td)
        return
    if not args.sentibank and not args.dlib_face:
        raise SystemExit("nothing to do: pass --sentibank/--dlib-face "
                         "(or --dry-run)")
    stored = dict(np.load(args.stored_feats)) if args.stored_feats else None
    if args.sentibank:
        gate_sentibank(args.sentibank, stored)
    if args.dlib_face:
        gate_dlib(args.dlib_face, stored)


if __name__ == "__main__":
    main()
