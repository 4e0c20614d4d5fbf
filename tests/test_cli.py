"""CLI end-to-end test: TIFF views in, deconvolved TIFF out."""

import numpy as np
import pytest

from libmultiviewnative_tpu.cli import main as cli_main
from libmultiviewnative_tpu.io.stacks import read_tiff_stack, write_tiff_stack
from libmultiviewnative_tpu.reference.numpy_ref import (
    np_convolve_spectrum,
    np_wrap_kernel,
)
from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel


def test_cli_roundtrip(tmp_path, capsys):
    shape = (16, 16, 16)
    rng = np.random.default_rng(3)
    phantom = np.full(shape, 1.0)
    phantom[8, 8, 8] = 300.0

    view_args = []
    for v in range(2):
        psf = gaussian_kernel((5, 5, 5), 1.0 + 0.3 * v)
        blurred = np_convolve_spectrum(
            phantom, np.fft.rfftn(np_wrap_kernel(psf, shape))
        ).astype(np.float32)
        vp = str(tmp_path / f"view{v}.tif")
        kp = str(tmp_path / f"psf{v}.tif")
        write_tiff_stack(vp, blurred)
        write_tiff_stack(kp, psf)
        view_args += ["--view", vp, "--psf", kp]

    out = str(tmp_path / "deconv.tif")
    rc = cli_main(view_args + [
        "-o", out, "-i", "8", "--lambda", "0", "--algorithm", "fft",
    ])
    assert rc == 0
    assert "wrote" in capsys.readouterr().out
    result = read_tiff_stack(out)
    assert result.shape == shape
    # deconvolution sharpened the bead
    blurred0 = read_tiff_stack(str(tmp_path / "view0.tif"))
    assert result[8, 8, 8] > blurred0[8, 8, 8]


def test_cli_arg_validation(tmp_path):
    with pytest.raises(SystemExit):
        cli_main(["--view", "a.tif", "-o", "x.tif"])  # missing --psf
