#!/usr/bin/env python3
"""Build tag-family codebook data files (aprilslam_tpu/families/data/*.npz).

Codebooks are interoperability DATA (which cell of a tag is black/white for
each id), not code. Sources:

* ``tag36h11`` — all 587 markers, extracted by rendering each marker with
  OpenCV's bundled AprilTag 36h11 dictionary (cv2.aruco.DICT_APRILTAG_36h11)
  at one pixel per cell and sampling the cells. OpenCV ships the genuine
  AprilRobotics 36h11 family, so images produced from these grids are
  detectable by any standard AprilTag decoder and vice versa.
* ``tagStandard41h12`` — the first 5 markers (ids 0-4), sampled from the
  354x354 px reference scene textures (9x9 cells). These are the ids used by
  every reference scene config. The full 2115-code family is not
  redistributable from here; for large synthetic scenes use
  ``aprilslam_tpu.families.generate.generate_family`` which builds arbitrary-
  size custom families with a guaranteed Hamming margin.

Layout metadata follows the AprilTag 3 family descriptions:
* tag36h11: 6x6 data bits, black border, white margin -> total_width 10,
  width_at_border 8, reversed_border False.
* tagStandard41h12: 41 data bits (outer ring of 32 + centre 3x3), border
  between ring1 (black) and ring2 (white) -> total_width 9, width_at_border 5,
  reversed_border True.
"""

import os
import warnings

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "aprilslam_tpu", "families", "data")
REF_TAGS = "/root/reference/assets/tags"


def build_tag36h11():
    import cv2

    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11)
    n = d.bytesList.shape[0]
    grids = np.zeros((n, 10, 10), dtype=np.uint8)
    grids[:, 0, :] = 1  # white margin ring
    grids[:, -1, :] = 1
    grids[:, :, 0] = 1
    grids[:, :, -1] = 1
    for i in range(n):
        img = cv2.aruco.generateImageMarker(d, i, 8)  # 8x8 px: 1px/cell incl. border
        cells = (img > 128).astype(np.uint8)
        grids[i, 1:9, 1:9] = cells
    return dict(
        name="tag36h11",
        grids=grids,
        total_width=10,
        width_at_border=8,
        reversed_border=False,
        min_hamming=11,
    )


def build_tagStandard41h12():
    from PIL import Image

    grids = []
    ids = []
    for tid in range(5):
        path = os.path.join(REF_TAGS, f"tag{tid}.png")
        if not os.path.exists(path):
            continue
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            im = np.array(Image.open(path).convert("L"))
        assert im.shape == (354, 354), im.shape
        centers = ((np.arange(9) + 0.5) * im.shape[0] / 9).astype(int)
        grid = (im[np.ix_(centers, centers)] > 128).astype(np.uint8)
        # Sanity: ring1 (border) is black, ring2 is white for this family.
        ring1 = np.concatenate([grid[1, 1:8], grid[7, 1:8], grid[2:7, 1], grid[2:7, 7]])
        ring2 = np.concatenate([grid[2, 2:7], grid[6, 2:7], grid[3:6, 2], grid[3:6, 6]])
        assert ring1.sum() == 0, f"tag{tid}: border ring not black"
        assert ring2.sum() == ring2.size, f"tag{tid}: inner ring not white"
        grids.append(grid)
        ids.append(tid)
    return dict(
        name="tagStandard41h12",
        grids=np.stack(grids),
        total_width=9,
        width_at_border=5,
        reversed_border=True,
        min_hamming=12,
    )


def save(fam):
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{fam['name']}.npz")
    np.savez_compressed(path, **fam)
    print(f"wrote {path}: {fam['grids'].shape[0]} codes, "
          f"{fam['total_width']}x{fam['total_width']} cells")


if __name__ == "__main__":
    save(build_tag36h11())
    save(build_tagStandard41h12())
