"""Generate the frozen golden preprocessing fixtures.

Run once (``python tests/golden/gen_golden_preproc.py``) to (re)create
``tests/golden/preproc_golden.npz``.  The fixture freezes seeded outputs
of the mm-critical host preprocessing path — ``crop_area_3d``
(reference handdetector.py:384-492), ``normalize`` and ``augment_crop``
in every mode (dataset_hand2.py:27-119) — so later backend/refactor work
cannot silently drift the numbers the ±0.5 mm parity gate depends on.
Regenerating is a deliberate act: the diff shows up in git.
"""

import os

import numpy as np

from lsps_tpu.data.augment import augment_crop, normalize
from lsps_tpu.data.detector import HandDetector

OUT = os.path.join(os.path.dirname(__file__), "preproc_golden.npz")

FX, FY = 588.03, 587.07  # NYU Kinect intrinsics (importers.py:961)


def synth_depth(seed=0, w=320, h=240):
    """Deterministic hand-like blob on a far background."""
    rs = np.random.RandomState(seed)
    dpt = np.full((h, w), 2000.0, np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    # palm disc + three finger bars around (160, 120, ~800mm)
    palm = (xx - 160) ** 2 + (yy - 130) ** 2 < 35 ** 2
    dpt[palm] = 800.0 + 40.0 * np.exp(-((xx[palm] - 160) ** 2
                                        + (yy[palm] - 130) ** 2) / 800.0)
    for i, fx0 in enumerate((140, 158, 176)):
        fing = (np.abs(xx - fx0) < 5) & (yy > 70) & (yy < 130)
        dpt[fing] = 790.0 - 15.0 * i
    dpt += rs.rand(h, w).astype(np.float32)  # sub-mm jitter
    return dpt


def build():
    dpt = synth_depth()
    com = np.array([160.0, 120.0, 800.0])
    out = {"dpt": dpt, "com": com}

    from lsps_tpu.data.camera import Camera

    # Camera provides the joint_img_to_3d/joint_3d_to_img surface the
    # detector needs for move_com/scale_hand
    hd = HandDetector(dpt, FX, FY, importer=Camera.nyu())

    for tag, size, dsize in (("a", (250, 250, 250), (128, 128)),
                             ("b", (300, 300, 300), (128, 128)),
                             ("c", (250, 250, 250), (64, 64))):
        crop, m, com_out = hd.crop_area_3d(com=com.copy(), size=size,
                                           dsize=dsize)
        out[f"crop_{tag}"] = crop
        out[f"M_{tag}"] = m
        out[f"com_{tag}"] = com_out

    # docom refinement variant (handdetector.py:415-428)
    crop, m, com_out = hd.crop_area_3d(com=com.copy(),
                                       size=(250, 250, 250),
                                       dsize=(128, 128), docom=True)
    out["crop_docom"], out["M_docom"], out["com_docom"] = crop, m, com_out

    # normalized crop + per-mode augmentation goldens
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    base_crop, base_m, base_com = hd.crop_area_3d(com=com.copy(),
                                                  size=(250, 250, 250),
                                                  dsize=(128, 128))
    norm = normalize(base_crop.copy(), base_com, cube)
    out["norm"] = norm

    rs = np.random.RandomState(11)
    gt3d = (rs.rand(36, 3).astype(np.float32) - 0.5) * 200.0
    out["gt3d"] = gt3d

    for mode in ("none", "com", "rot", "sc"):
        rng = np.random.RandomState(23455 + len(mode))
        img_d, _, label, cube_o, com_o, m_o, rot = augment_crop(
            norm.copy(), gt3d, base_com.astype(np.float32), cube.copy(),
            base_m.astype(np.float32), [mode], hd, rng=rng)
        out[f"aug_{mode}_img"] = img_d
        out[f"aug_{mode}_label"] = label
        out[f"aug_{mode}_cube"] = cube_o
        out[f"aug_{mode}_com"] = com_o
        out[f"aug_{mode}_M"] = m_o
        out[f"aug_{mode}_rot"] = np.float64(rot)

    # standalone ND-aware bilinear resize golden (handdetector.py:134-204)
    src = dpt[100:160, 130:190].copy()
    src[5:10, 5:10] = hd.get_nd_value()
    out["bilin_src"] = src
    out["bilin_out"] = HandDetector.bilinear_resize(src, (41, 37),
                                                    hd.get_nd_value())
    return out


if __name__ == "__main__":
    arrs = build()
    np.savez_compressed(OUT, **arrs)
    print(f"wrote {OUT} with {len(arrs)} arrays")
