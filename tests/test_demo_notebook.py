"""demo.ipynb must execute headlessly — the canonical API walkthrough
cannot rot (reference demo.ipynb is the reference's only usage doc).

The notebook is executed with nbclient in a scratch dir holding a real
song.wav; only two harness adaptations are applied: a prepended cell
forcing the CPU backend (the kernel is a fresh process and sitecustomize
force-registers the TPU backend — CLAUDE.md), and a cap on the decode
length so the untrained-model decode stays fast.  Every original cell
runs as written, including synthesis, both piano-roll plots, and the
output writes.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # multi-minute: excluded by -m 'not slow'

from pathlib import Path

import numpy as np
import pytest

nbformat = pytest.importorskip("nbformat")
pytest.importorskip("nbclient")

from music2midi_tpu.audio import write_wav  # noqa: E402

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def demo_dir(tmp_path):
    sr = 16000
    t = np.arange(3 * sr) / sr
    y = (
        0.4 * np.sin(2 * np.pi * 330 * t)
        + 0.2 * np.sin(2 * np.pi * 415 * t)
    ).astype(np.float32)
    write_wav(tmp_path / "song.wav", y, sr)
    return tmp_path


def test_demo_notebook_executes(demo_dir):
    import nbclient

    nb = nbformat.read(REPO / "demo.ipynb", as_version=4)
    harness = nbformat.v4.new_code_cell(
        "import sys, jax\n"
        f"sys.path.insert(0, {str(REPO)!r})\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from music2midi_tpu.infer import Music2MIDI as _M\n"
        "import functools\n"
        "_M.from_random = functools.partial(\n"
        "    _M.from_random.__func__, _M, decode_max_length=64)\n"
    )
    nb.cells.insert(0, harness)
    client = nbclient.NotebookClient(
        nb, timeout=300, kernel_name="python3",
        resources={"metadata": {"path": str(demo_dir)}},
    )
    client.execute()

    assert (demo_dir / "roll.html").exists()
    assert (demo_dir / "output.mid").exists()
    assert (demo_dir / "output.wav").exists()
    # every code cell ran and produced no error output
    for cell in nb.cells:
        if cell.cell_type != "code":
            continue
        for out in cell.get("outputs", []):
            assert out.get("output_type") != "error", out
