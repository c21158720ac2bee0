"""Driver-side external-source utilities (SURVEY.md S8/S11/S12).

These rebuild the reference's derived dimension tables (deflators, FX rates)
from their upstream services. They are deliberately driver-side: each feeds a
dimension of at most ~20k rows (BASELINE.md), so the cluster's job starts at
the resulting broadcastable DataFrame. All network access goes through an
injectable ``fetcher`` so tests (and offline runs) use canned responses —
no function here touches the network unless handed a live fetcher.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import date

Fetcher = Callable[[str], object]  # url -> parsed JSON (dict) | response obj

WEO_URL_TEMPLATE = (
    "https://www.imf.org/-/media/Files/Publications/WEO/WEO-Database/"
    "{year}/{month_name}/WEO{ver}all.ashx"
)
_MONTH_FULL = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]
_MONTH_ABBR = [m[:3] for m in _MONTH_FULL]
WEO_CONTENT_TYPE = "application/vnd.ms-excel"


def _weo_candidate(year: int, month: int) -> tuple[str, str]:
    ver = f"{_MONTH_ABBR[month - 1]}{year}"
    return ver, WEO_URL_TEMPLATE.format(
        year=year, month_name=_MONTH_FULL[month - 1], ver=ver
    )


def weo_vintage_candidates(
    today: date, max_probes: int = 8
) -> list[tuple[str, str]]:
    """S8 — the WEO vintage probe order: (version-tag, url) pairs, seed date
    first, then stepping back through Apr/Oct releases exactly like the
    reference's retry loop (code/03_deflators.R:31-41): a month in (4, 10]
    falls to April of the same year; a month <= 4 falls to October of the
    previous year; a month > 10 falls to October of the same year.
    """
    year, month = today.year, today.month
    out = [_weo_candidate(year, month)]
    while len(out) < max_probes:
        if 4 < month <= 10:
            month = 4
        else:
            if month <= 4:
                year -= 1
            month = 10
        out.append(_weo_candidate(year, month))
    return out


def probe_weo_version(
    today: date,
    head: Callable[[str], str],
    max_probes: int = 8,
) -> tuple[str, str]:
    """S8 — return (version, url) of the newest vintage whose content-type
    matches the Excel payload (reference loop code/03_deflators.R:31-41).
    ``head(url)`` must return the response content-type."""
    for ver, url in weo_vintage_candidates(today, max_probes):
        if head(url) == WEO_CONTENT_TYPE:
            return ver, url
    raise LookupError("no WEO vintage found within probe horizon")


def decode_sdmx_json(payload: dict) -> list[dict]:
    """S11 — decode an OECD SDMX-JSON observation matrix to flat rows
    (reference code/util_oecd_sdmx.R:8-49).

    Observations are keyed by ':'-joined dimension indices; each maps to
    [value, attr_index...]. Output: one dict per observation with dimension
    NAMES resolved through the structure block (second element of each
    dimension value — the reference uses ``[[2]]``, the human-readable
    name), attributes resolved the same way (null-safe), plus ``value``.
    """
    dataset = payload["dataSets"][0]["observations"]
    structure = payload["structure"]
    dimensions = structure["dimensions"]["observation"]
    attributes = structure.get("attributes", {}).get("observation", [])
    rows: list[dict] = []
    for key, obs in dataset.items():
        row: dict = {}
        for j, idx in enumerate(key.split(":")):
            dim = dimensions[j]
            row[dim["name"]] = dim["values"][int(idx)]["name"]
        for j, att in enumerate(attributes):
            raw = obs[j + 1] if len(obs) > j + 1 else None
            row[att["name"]] = (
                att["values"][int(raw)]["name"] if raw is not None else None
            )
        row["value"] = obs[0]
        rows.append(row)
    return rows


WB_FX_URL = (
    "https://api.worldbank.org/v2/country/all/indicator/PA.NUS.ATLS"
    "?date=1950:2025&format=json&per_page=20000"
)


def fetch_wb_fx(fetcher: Fetcher, url: str = WB_FX_URL) -> list[dict]:
    """S12a — World Bank Atlas FX rates → (iso3, year, value) rows
    (reference code/util_exchange_rates.R:55-62). Null values dropped, like
    the reference's !is.na(value) guard."""
    payload = fetcher(url)
    records = payload[1] if isinstance(payload, list) else payload["data"]
    return [
        {
            "iso3": r.get("countryiso3code"),
            "year": int(r["date"]),
            "value": float(r["value"]),
        }
        for r in records
        if r.get("value") is not None and r.get("countryiso3code")
    ]


def decode_ifs_rates(
    records: list[dict], iso2_to_iso3: dict[str, str]
) -> list[dict]:
    """S12b — IMF IFS annual ENDA_XDC_USD_RATE rows → (iso3, year, value)
    (reference code/util_exchange_rates.R:65-72): iso2 areas mapped through
    the isos dimension; rows with unmappable area or null value dropped."""
    out = []
    for r in records:
        iso3 = iso2_to_iso3.get(r.get("ref_area"))
        if iso3 is None or r.get("value") is None:
            continue
        out.append(
            {"iso3": iso3, "year": int(r["date"]), "value": float(r["value"])}
        )
    return out
