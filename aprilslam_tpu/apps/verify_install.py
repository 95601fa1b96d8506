"""Installation verifier — parity with scripts/verify_installation.py:37-213.

Checks every dependency, runs a functional detector smoke test (render a
known tag, detect it, assert the id), validates the default scene config,
and reports device availability.
"""

from __future__ import annotations

import argparse
import importlib
import sys

GREEN, RED, YELLOW, RESET = "\033[92m", "\033[91m", "\033[93m", "\033[0m"


def check(name, fn):
    try:
        detail = fn()
        print(f"{GREEN}[ok]{RESET} {name}" + (f" — {detail}" if detail else ""))
        return True
    except Exception as e:  # noqa: BLE001 - report anything
        print(f"{RED}[FAIL]{RESET} {name}: {type(e).__name__}: {e}")
        return False


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="verify aprilslam_tpu installation")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args(argv)

    results = []

    def dep(mod):
        m = importlib.import_module(mod)
        return getattr(m, "__version__", "")

    for mod in ["jax", "jaxlib", "numpy", "flax", "optax", "chex"]:
        results.append(check(f"dependency {mod}", lambda m=mod: dep(m)))
    for mod in ["cv2", "matplotlib", "PIL"]:
        ok = check(f"optional {mod}", lambda m=mod: dep(m))
        if not ok:
            print(f"{YELLOW}     (optional: real-camera/viz paths degrade gracefully){RESET}")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    results.append(check("jax devices", lambda: str(jax.devices())))

    def families_ok():
        from aprilslam_tpu.families import get_family

        f36 = get_family("tag36h11")
        f41 = get_family("tagStandard41h12")
        assert f36.n_codes == 587 and f41.n_codes >= 5
        return f"tag36h11 x{f36.n_codes}, tagStandard41h12 x{f41.n_codes}"

    results.append(check("tag family codebooks", families_ok))

    def scene_ok():
        from aprilslam_tpu.sim import SceneConfig

        cfg = SceneConfig.from_file()
        return f"{len(cfg.tags)} tags, {cfg.display_size}"

    results.append(check("default scene config", scene_ok))

    def functional_ok():
        import numpy as np
        import jax.numpy as jnp

        from aprilslam_tpu.geometry import PinholeCamera
        from aprilslam_tpu.sim import SceneConfig, scene_tensors, render_frames
        from aprilslam_tpu.detect import TagDetector, DetectorParams

        cfg = SceneConfig.from_file()
        cam = PinholeCamera.from_fov(256, 256, cfg.fov_y)
        scene = scene_tensors(cfg)
        frames = render_frames(
            scene, jnp.zeros((1, 3), jnp.float32), jnp.zeros((1, 3), jnp.float32),
            jnp.asarray(cam.inv_matrix), 256, 256, 1,
        )
        out = TagDetector(cfg.family, DetectorParams(quad_decimate=1)).detect(frames)
        ids = np.asarray(out.ids)[0][np.asarray(out.valid)[0]].tolist()
        assert 0 in ids, f"tag 0 not detected ({ids})"
        return f"detected tags {ids}"

    results.append(check("functional render+detect smoke test", functional_ok))

    n_fail = results.count(False)
    print(
        f"\n{len(results) - n_fail}/{len(results)} required checks passed"
        + (f" — {RED}{n_fail} FAILED{RESET}" if n_fail else f" {GREEN}all good{RESET}")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
