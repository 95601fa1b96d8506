"""Tag family data + codebook matcher tests."""

import numpy as np
import pytest

from aprilslam_tpu.families import get_family, list_families
from aprilslam_tpu.families.generate import generate_family


class TestBuiltins:
    def test_listing(self):
        fams = list_families()
        assert "tag36h11" in fams and "tagStandard41h12" in fams

    def test_tag36h11_shape(self):
        f = get_family("tag36h11")
        assert f.n_codes == 587
        assert f.total_width == 10 and f.width_at_border == 8
        assert not f.reversed_border

    def test_tagStandard41h12_shape(self):
        f = get_family("tagStandard41h12")
        assert f.n_codes == 5
        assert f.total_width == 9 and f.width_at_border == 5
        assert f.reversed_border

    def test_border_rings_polarity(self):
        for name in ["tag36h11", "tagStandard41h12"]:
            f = get_family(name)
            black, white = f.border_rings()
            assert not np.any(black & white)
            # every code must be black on black_mask, white on white_mask
            assert np.all(f.grids[:, black] == 0), name
            assert np.all(f.grids[:, white] == 1), name

    def test_hamming_margin_tag36h11(self):
        f = get_family("tag36h11")
        mask = f.sample_mask()
        # data bits only (inside border, excluding the border ring itself)
        inner = np.zeros_like(mask)
        inner[2:8, 2:8] = True
        bits = f.grids[:, inner].astype(np.int8)
        # pairwise distance over a sample (full 587^2 x4 is slow in python)
        idx = np.arange(0, 587, 29)
        for i in idx:
            rot_i = [np.rot90(f.grids[i], k)[inner].astype(np.int8) for k in range(4)]
            d = np.stack([(bits != r[None, :]).sum(axis=1) for r in rot_i]).min(axis=0)
            d[i] = 99
            assert d.min() >= 11, f"code {i} margin {d.min()}"


class TestCodebook:
    @pytest.mark.parametrize("name", ["tag36h11", "tagStandard41h12"])
    def test_match_identifies_rotations(self, name):
        f = get_family(name)
        tmpl, meta = f.codebook()
        mask = f.sample_mask()
        n = f.n_codes
        for tid in range(0, n, max(1, n // 7)):
            for k in range(4):
                sampled = np.rot90(f.grids[tid], k)[mask].astype(np.float32) * 2 - 1
                scores = sampled @ tmpl.T
                best = int(np.argmax(scores))
                assert meta[best, 0] == tid
                assert meta[best, 1] == k
                # perfect match score == D
                assert scores[best] == mask.sum()

    def test_noisy_match(self, rng):
        f = get_family("tag36h11")
        tmpl, meta = f.codebook()
        mask = f.sample_mask()
        sampled = f.grids[123][mask].astype(np.float32) * 2 - 1
        flip = rng.choice(len(sampled), size=3, replace=False)
        sampled[flip] *= -1
        best = int(np.argmax(sampled @ tmpl.T))
        assert meta[best, 0] == 123 and meta[best, 1] == 0


class TestGenerate:
    def test_generate_small_family(self):
        fam = generate_family(24, min_hamming=9, total_width=9, seed=3, register=False)
        assert fam.n_codes == 24
        tmpl, meta = fam.codebook()
        mask = fam.sample_mask()
        # decoding its own codes works
        for tid in [0, 7, 23]:
            sampled = fam.grids[tid][mask].astype(np.float32) * 2 - 1
            best = int(np.argmax(sampled @ tmpl.T))
            assert meta[best, 0] == tid and meta[best, 1] == 0
        # layout polarity holds
        black, white = fam.border_rings()
        assert np.all(fam.grids[:, black] == 0)
        assert np.all(fam.grids[:, white] == 1)

    def test_render(self):
        f = get_family("tag36h11")
        img = f.render(0, px_per_cell=4)
        assert img.shape == (40, 40)
        assert set(np.unique(img)) <= {0, 255}
