"""Minimal pure-Python SVG charts — the cdcplot graphs without matplotlib.

The reference ships chunk-distribution / CDF / resync / dedup-sweep PNGs
(/root/reference/cmd/cdcplot/main.go:53-365). This environment has no
plotting library, but SVG is plain XML, so these helpers render the same
four figures as standalone .svg files from the sweep pipelines' metric
tables.

Design rules (dataviz method): one axis per chart; magnitude = single hue;
identity = fixed categorical hue order (validated palette, never cycled);
thin baseline-anchored bars with surface gaps; 2px lines; recessive grid;
text in neutral ink, never series-colored; legend + direct end-labels for
multi-series, none for single-series (the title names it).
"""

from __future__ import annotations

import html

# Validated categorical order (light surface) — slots are assigned to
# series in fixed order, never cycled; >5 series should fold into "other".
CATEGORICAL = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4"]
SEQUENTIAL = "#2a78d6"  # single-hue magnitude
INK = "#1a1a19"
INK_2 = "#5f5e56"
GRID = "#e5e4dd"
SURFACE = "#ffffff"

W, H = 720, 400
ML, MR, MT, MB = 64, 24, 40, 48  # margins: left/right/top/bottom


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        v = int(v)
        for div, suf in ((1 << 30, "G"), (1 << 20, "M"), (1 << 10, "K")):
            if v and v % div == 0:
                return f"{v // div}{suf}"
        return str(v)
    return f"{v:.3g}"


def _ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    if hi <= lo:
        return [lo]
    import math

    raw = (hi - lo) / n
    mag = 10 ** math.floor(math.log10(raw))
    step = next(s * mag for s in (1, 2, 2.5, 5, 10) if s * mag >= raw)
    t0 = math.ceil(lo / step) * step
    out = []
    t = t0
    while t <= hi + 1e-9 * step:
        out.append(round(t, 10))
        t += step
    return out


class _Canvas:
    def __init__(self, title: str, x_label: str, y_label: str,
                 x_range: tuple[float, float], y_range: tuple[float, float]):
        self.parts: list[str] = []
        self.x0, self.x1 = x_range
        self.y0, self.y1 = y_range
        self.parts.append(
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
            f'viewBox="0 0 {W} {H}" font-family="system-ui, sans-serif">'
            f'<rect width="{W}" height="{H}" fill="{SURFACE}"/>'
            f'<text x="{ML}" y="24" font-size="15" font-weight="600" '
            f'fill="{INK}">{html.escape(title)}</text>'
        )
        self._axes(x_label, y_label)

    def px(self, x: float) -> float:
        span = self.x1 - self.x0 or 1.0
        return ML + (x - self.x0) / span * (W - ML - MR)

    def py(self, y: float) -> float:
        span = self.y1 - self.y0 or 1.0
        return H - MB - (y - self.y0) / span * (H - MT - MB)

    def _axes(self, x_label: str, y_label: str):
        p = self.parts
        for t in _ticks(self.y0, self.y1):
            y = self.py(t)
            p.append(f'<line x1="{ML}" y1="{y:.1f}" x2="{W - MR}" y2="{y:.1f}" '
                     f'stroke="{GRID}" stroke-width="1"/>')
            p.append(f'<text x="{ML - 8}" y="{y + 4:.1f}" font-size="11" '
                     f'fill="{INK_2}" text-anchor="end">{_fmt(t)}</text>')
        for t in _ticks(self.x0, self.x1, 6):
            x = self.px(t)
            p.append(f'<text x="{x:.1f}" y="{H - MB + 18}" font-size="11" '
                     f'fill="{INK_2}" text-anchor="middle">{_fmt(t)}</text>')
        p.append(f'<line x1="{ML}" y1="{H - MB}" x2="{W - MR}" y2="{H - MB}" '
                 f'stroke="{INK_2}" stroke-width="1"/>')
        p.append(f'<text x="{(ML + W - MR) / 2:.0f}" y="{H - 10}" font-size="12" '
                 f'fill="{INK_2}" text-anchor="middle">{html.escape(x_label)}</text>')
        p.append(f'<text x="14" y="{(MT + H - MB) / 2:.0f}" font-size="12" '
                 f'fill="{INK_2}" text-anchor="middle" '
                 f'transform="rotate(-90 14 {(MT + H - MB) / 2:.0f})">'
                 f'{html.escape(y_label)}</text>')

    def finish(self) -> str:
        return "".join(self.parts) + "</svg>"


def bar_chart(title: str, x_label: str, y_label: str,
              lows: list[float], highs: list[float], counts: list[int]) -> str:
    """Single-series histogram: baseline-anchored bars, 2px surface gaps."""
    c = _Canvas(title, x_label, y_label, (min(lows), max(highs)),
                (0, max(max(counts), 1) * 1.05))
    base = c.py(0)
    for lo, hi, n in zip(lows, highs, counts):
        if n <= 0:
            continue
        x, x2, y = c.px(lo), c.px(hi), c.py(n)
        w = max(x2 - x - 2, 1.0)  # 2px gap between adjacent bars
        c.parts.append(
            f'<rect x="{x + 1:.1f}" y="{y:.1f}" width="{w:.1f}" '
            f'height="{base - y:.1f}" rx="1" fill="{SEQUENTIAL}">'
            f'<title>[{_fmt(lo)}, {_fmt(hi)}): {n}</title></rect>'
        )
    return c.finish()


def line_chart(title: str, x_label: str, y_label: str,
               series: dict[str, tuple[list[float], list[float]]],
               y_range: tuple[float, float] | None = None) -> str:
    """One or more series as 2px lines with >=8px hoverable markers.
    Multi-series charts get a legend row plus direct end-labels; hues come
    from the fixed categorical order."""
    xs_all = [x for xs, _ in series.values() for x in xs]
    ys_all = [y for _, ys in series.values() for y in ys]
    if y_range is None:
        lo, hi = min(ys_all), max(ys_all)
        pad = (hi - lo) * 0.08 or abs(hi) * 0.08 or 1.0
        y_range = (lo - pad, hi + pad)
    c = _Canvas(title, x_label, y_label, (min(xs_all), max(xs_all)), y_range)
    multi = len(series) > 1
    for i, (name, (xs, ys)) in enumerate(series.items()):
        color = CATEGORICAL[i % len(CATEGORICAL)] if multi else SEQUENTIAL
        pts = " ".join(f"{c.px(x):.1f},{c.py(y):.1f}" for x, y in zip(xs, ys))
        c.parts.append(f'<polyline points="{pts}" fill="none" '
                       f'stroke="{color}" stroke-width="2"/>')
        for x, y in zip(xs, ys):
            c.parts.append(
                f'<circle cx="{c.px(x):.1f}" cy="{c.py(y):.1f}" r="4" '
                f'fill="{color}" stroke="{SURFACE}" stroke-width="2">'
                f'<title>{html.escape(name)}: ({_fmt(x)}, {_fmt(y)})</title>'
                f'</circle>'
            )
        if multi:  # direct end-label in neutral ink, colored mark carries identity
            c.parts.append(
                f'<text x="{c.px(xs[-1]) + 8:.1f}" y="{c.py(ys[-1]) + 4:.1f}" '
                f'font-size="11" fill="{INK}">{html.escape(name)}</text>'
            )
    if multi:
        lx = ML
        for i, name in enumerate(series):
            color = CATEGORICAL[i % len(CATEGORICAL)]
            c.parts.append(f'<rect x="{lx}" y="{MT - 8}" width="10" height="10" '
                           f'rx="2" fill="{color}"/>')
            c.parts.append(f'<text x="{lx + 14}" y="{MT + 1}" font-size="11" '
                           f'fill="{INK_2}">{html.escape(name)}</text>')
            lx += 24 + 7 * len(name)
    return c.finish()
