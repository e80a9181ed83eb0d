"""68-landmark alignment: analytic ground truth, regression, chip parity.

The reference aligns faces with dlib's 68-point shape predictor before
embedding (reference: cufacesearch/cufacesearch/featurizer/
dlib_featurizer.py:50-105). Here the 68-point head trains on exact
procedural annotations (``face_synth.landmarks68``); these tests check
(a) the analytic landmarks coincide with the rendered geometry, (b) the
net generalizes to held-out identities, and (c) 68-point chips place the
eyes where the 5-point template does (embedding compatibility).
"""

import numpy as np

from columbiaimagesearch_tpu.models import face_synth
from columbiaimagesearch_tpu.models.face_align import (
    CANONICAL_POINTS,
    CHIP_SIZE,
    FaceAligner,
    canonical_points_68,
    init_landmark_params,
    key5_from_68,
    make_landmark_training_set,
    predict_landmarks,
    train_landmark_net,
)

TRAIN_IDS = range(0, 40)
HELD_OUT_IDS = range(200, 212)  # disjoint from training AND the template


def test_landmarks68_match_rendered_geometry():
    """Analytic eye/mouth landmarks sit on the rendered features."""
    for identity in (0, 7, 123):
        img, bbox = face_synth.render_face(identity)
        pts = face_synth.landmarks68(identity)
        assert pts.shape == (68, 2)
        # Eye ring structure: the landmark centroid is the dark pupil
        # (painted at e_out <= 0.45) and the surrounding window holds the
        # bright sclera ellipse (235 pre-downsample).
        p0 = face_synth.sample_identity(identity)
        rx = int(p0["eye_w"] * face_synth.FACE_CANVAS) + 2
        for sl in (slice(36, 42), slice(42, 48)):
            ex, ey = pts[sl].mean(axis=0).astype(int)
            assert img[ey, ex] < 100, (identity, sl)
            win = img[ey - rx:ey + rx + 1, ex - rx:ex + rx + 1]
            assert win.max() > 150, (identity, sl)
        # Mouth corners land on/near the dark mouth bar: the 3x3 patch
        # around each corner must dip well below the local skin tone.
        p = face_synth.sample_identity(identity)
        for idx in (48, 54):
            x, y = pts[idx].astype(int)
            patch = img[y - 1:y + 2, x - 1:x + 2]
            assert patch.min() < p["skin"] * 0.8, (identity, idx)
        # Jaw points trace the face ellipse: all inside the bbox, chin
        # (point 8) at its bottom edge.
        l, t, r, b = bbox
        assert np.all(pts[0:17, 0] >= l - 1) and np.all(pts[0:17, 0] <= r + 1)
        assert abs(pts[8, 1] - b) < 2.5
        assert abs(pts[8, 0] - (l + r) / 2) < 2.5


def test_canonical_68_template_consistent_with_5pt():
    from columbiaimagesearch_tpu.models.face_align import (
        estimate_similarity)

    tpl = canonical_points_68()
    assert tpl.shape == (68, 2)
    # The procedural mean shape is not exactly similar to the ArcFace
    # 5-point layout, so the key points carry a least-squares residual —
    # the invariant is that the template already sits in the best-fit
    # frame: re-fitting its key-5 onto CANONICAL_POINTS is the identity.
    A = estimate_similarity(key5_from_68(tpl), CANONICAL_POINTS)
    np.testing.assert_allclose(A[:, :2], np.eye(2), atol=1e-3)
    np.testing.assert_allclose(A[:, 2], 0.0, atol=0.2)
    # Sane chip placement: inside bounds, eyes level and left-of-right.
    assert tpl.min() > 0 and tpl.max() < CHIP_SIZE
    leye, reye = key5_from_68(tpl)[0], key5_from_68(tpl)[1]
    assert abs(leye[1] - reye[1]) < 2 and leye[0] < reye[0]


def test_landmark68_net_generalizes_to_held_out_identities():
    crops, targets = make_landmark_training_set(TRAIN_IDS,
                                                n_per_identity=3, seed=0)
    params = init_landmark_params(0, n_points=68)
    params, loss = train_landmark_net(params, crops, targets, steps=400)
    assert loss < 5e-3
    ho_crops, ho_targets = make_landmark_training_set(
        HELD_OUT_IDS, n_per_identity=2, seed=1)
    pred = np.asarray(predict_landmarks(params, ho_crops, n_points=68))
    err = np.abs(pred - ho_targets).mean()
    assert err < 0.06, f"held-out landmark error {err:.4f}"

    # Chips from the 68-point aligner place both eyes at the canonical
    # positions (dark pupil ring inside bright sclera nearby).
    aligner = FaceAligner(params=params, n_points=68)
    img, bbox = face_synth.render_face(205)
    chips = aligner.align(img, [{
        "left": bbox[0], "top": bbox[1], "right": bbox[2],
        "bottom": bbox[3], "score": 1.0}])
    assert chips.shape == (1, CHIP_SIZE, CHIP_SIZE, 3)
    chip = chips[0].mean(axis=2)
    for cx, cy in CANONICAL_POINTS[:2]:
        win = chip[int(cy) - 10:int(cy) + 10, int(cx) - 10:int(cx) + 10]
        assert win.max() > 140, f"no sclera near canonical eye ({cx},{cy})"
