"""Microfluidic-chip walkthrough: pinlist tagging, detection, QC filtering.

Builds a synthetic 6x6 button chip (with two blank chambers), writes a
pinlist CSV, runs the chip pipeline with an expression filter attached, and
prints the per-chamber validity table.

Run:  python examples/chip_example.py
"""

import io

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import magnify_tpu as mg
from magnify_tpu.utils import filled_circle_points

GRID = (6, 6)
PITCH = 100


def make_chip(blanks):
    img = np.zeros(((GRID[0] + 1) * PITCH, (GRID[1] + 1) * PITCH), np.uint16)
    disk = filled_circle_points(10)
    rng = np.random.default_rng(0)
    img += rng.normal(50, 2, img.shape).astype(np.uint16)
    for i in range(GRID[0]):
        for j in range(GRID[1]):
            if (i, j) in blanks:
                continue
            img[disk[:, 0] + (i + 1) * PITCH,
                disk[:, 1] + (j + 1) * PITCH] = 1000
    return img


def make_pinlist(blanks):
    rows = ["Indices,MutantID"]
    for i in range(GRID[0]):
        for j in range(GRID[1]):
            name = "blank" if (i, j) in blanks else f"mut_{i}{j}"
            rows.append(f'"({j + 1}, {i + 1})",{name}')
    return io.StringIO("\n".join(rows))


def main():
    blanks = {(1, 1), (4, 2)}
    data = mg.DataArray(make_chip(blanks), dims=("y", "x"))

    pipe = mg.microfluidic_chip_pipe(
        pinlist=make_pinlist(blanks),
        overlap=0,
        row_dist=PITCH,
        col_dist=PITCH,
        min_button_diameter=16,
        max_button_diameter=32,
        num_iter=200000,
    )
    # Attach a QC filter after detection, exactly like reference users do.
    pipe.add_pipe("filter_expression", after="find_buttons", min_contrast=200)

    xp = pipe(data).unstack().transpose("mark_row", "mark_col", ...)
    tags = xp.tag.values
    valid = xp.valid.squeeze().values
    print("tags:")
    print(tags)
    print("valid after expression filter (blanks should be False):")
    print(valid)
    n_blank_invalid = (~valid[tags == ""]).sum()
    print(f"{n_blank_invalid}/{len(blanks)} blank chambers filtered out")


if __name__ == "__main__":
    main()
