#!/usr/bin/env python
"""Realtime deployment-path demo (SURVEY.md §3.4).

Simulates the reference's live pipeline (README demo video): for a
stream of depth frames, detect the hand (closest-object sweep,
handdetector.py:571-636), crop/normalize on device, regress the pose,
and render annotated frames to an AVI.

Usage: python scripts/realtime_demo.py --frames 32 --out demo.avi
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--out", type=str, default="./outputs/realtime_demo.avi")
    p.add_argument("--ch", type=int, default=64)
    p.add_argument("--device-detect", action="store_true",
                   help="run CoM detection ON DEVICE inside the fused "
                        "program (PoseEstimator.predict_raw) instead of "
                        "the host-side detector — the whole frame->"
                        "joints path is then one XLA dispatch")
    opts = p.parse_args(argv)

    import cv2
    import numpy as np

    import jax

    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.data.camera import Camera
    from lsps_tpu.data.detector import HandDetector
    from lsps_tpu.data.synthetic import make_pose_basis, render_hand_depth
    from lsps_tpu.models import build_model
    from lsps_tpu.serve.inference import PoseEstimator
    from lsps_tpu.utils import viz
    from lsps_tpu.utils.skeleton import NYU_BONES, NYU_COLOR_IDX

    cam = Camera.nyu()
    hyp = default_hyperparameters(reg_dim=108, ch=opts.ch)
    kd, kv = jax.random.split(jax.random.PRNGKey(0))
    params = {"dis": build_model(hyp["dis"]).init(kd),
              "vae": build_model(hyp["vae"]).init(kv)}
    est = PoseEstimator(hyp, params, camera=cam)

    gen = np.random.RandomState(3)
    basis = make_pose_basis(36, np.random.RandomState(7))
    cube = np.array([300.0, 300.0, 300.0], np.float32)

    os.makedirs(os.path.dirname(opts.out) or ".", exist_ok=True)
    codec = cv2.VideoWriter_fourcc(*"XVID")
    vid = cv2.VideoWriter(opts.out, codec, 25, (128, 128))

    detect_ms, infer_ms = [], []
    com = None
    for t in range(opts.frames):
        # a hand drifting through the scene
        com3d = np.array([40 * np.sin(t / 6.0), 30 * np.cos(t / 9.0),
                          750 + 60 * np.sin(t / 5.0)], np.float32)
        dpt, _ = render_hand_depth(cam, com3d, 36, gen, pose_basis=basis)

        if opts.device_detect:
            # detect + crop + regress + decode: ONE device program
            t0 = time.perf_counter()
            joints, coms_out = est.predict_raw(dpt[None], cube[None],
                                               return_coms=True)
            joints, com = joints[0], np.asarray(coms_out[0])
            infer_ms.append((time.perf_counter() - t0) * 1e3)
            detect_ms.append(0.0)  # on-device, included in infer_ms
            hd = HandDetector(dpt, cam.fx, cam.fy)  # viz crop only
        else:
            t0 = time.perf_counter()
            hd = HandDetector(dpt, cam.fx, cam.fy)
            if com is None:
                com, _ = hd.detect(size=tuple(cube))  # cold start
            else:
                com = hd.refine_com_iterative(com, 3,
                                              tuple(cube))  # track
            detect_ms.append((time.perf_counter() - t0) * 1e3)

            t0 = time.perf_counter()
            joints = est.predict_frame(dpt, com, cube)
            infer_ms.append((time.perf_counter() - t0) * 1e3)

        # render the crop with the predicted skeleton
        crop, M, com = hd.crop_area_3d(com=com, size=tuple(cube))
        from lsps_tpu.data.augment import normalize

        com3d_est = cam.img_to_3d(np.asarray(com, np.float32))
        norm = normalize(crop.copy(), np.asarray(com, np.float32), cube)
        pose_norm = ((joints - com3d_est) / (cube[2] / 2.0)).reshape(-1)
        img = viz.vis_pair(cam, norm[None], pose_norm, M, com3d_est, cube,
                           NYU_COLOR_IDX, NYU_BONES)
        vid.write(img)

    vid.release()
    print(json.dumps({
        "metric": "realtime_demo",
        "frames": opts.frames,
        "device_detect": bool(opts.device_detect),
        "detect_ms_median": round(float(np.median(detect_ms)), 2),
        "infer_ms_median": round(float(np.median(infer_ms)), 3),
        "out": opts.out,
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
