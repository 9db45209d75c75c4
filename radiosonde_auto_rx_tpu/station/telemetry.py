"""Telemetry validation and enrichment.

``telemetry_filter`` mirrors the reference's checks (reference
auto_rx/auto_rx.py:566-725): zero position, altitude cap, satellite count,
station radius (with temporary block), clock sanity, and per-type serial
validity.  ``enrich_telemetry`` mirrors the decoder-side fixups
(reference auto_rx/autorx/decode.py handle_decoder_line :1602-2002):
datetime completion, freq fields, aprsid, iMet synthetic serial.
"""

import datetime
import re

from dateutil.parser import parse

from radiosonde_auto_rx_tpu.utils.geometry import position_info
from radiosonde_auto_rx_tpu.utils.serial import generate_aprs_id
from radiosonde_auto_rx_tpu.utils.sonde_specific import (
    fix_datetime, imet_unique_id)

VAISALA_SERIAL_RE = re.compile(r"[C-Z][\d][\d][\d]\d{4}")


def enrich_telemetry(telemetry: dict, freq_hz: float | None = None,
                     snr: float | None = None,
                     f_error: float | None = None,
                     station_code: str = "SONDE") -> dict:
    """Fill derived fields: datetime_dt, freq/freq_float, aprsid, iMet ID."""
    t = dict(telemetry)
    if freq_hz is not None:
        t["freq_float"] = freq_hz / 1e6
        t["freq"] = "%.3f MHz" % (freq_hz / 1e6)
    if snr is not None:
        t["snr"] = snr
    if f_error is not None:
        t["f_error"] = f_error

    # datetime: time-only strings (iMet/LMS/Weathex/RD41) get today's date
    dt_str = t["datetime"]
    if "T" in dt_str:
        t["datetime_dt"] = parse(dt_str)
    else:
        t["datetime_dt"] = fix_datetime(dt_str)

    # synthetic iMet serial from power-on time + frequency (the decoder
    # cannot know a serial; reference decode.py:1782 always generates one)
    if t["type"] == "IMET" and "freq_float" in t and \
            not re.match(r"IMET-[0-9A-F]{8}$", t["id"]):
        t["id"] = imet_unique_id(t, custom=station_code)

    if "aprsid" not in t:
        aid = generate_aprs_id(t)
        if aid:
            t["aprsid"] = aid
    return t


def telemetry_filter(telemetry: dict, config: dict):
    """Validate telemetry; returns "OK", "TempBlock", or False."""
    if telemetry["lat"] == 0.0 and telemetry["lon"] == 0.0:
        return False
    if telemetry["alt"] > config["max_altitude"]:
        return False
    if "sats" in telemetry and telemetry["sats"] < 4:
        return False

    if config["station_lat"] != 0.0 and config["station_lon"] != 0.0:
        info = position_info(
            (config["station_lat"], config["station_lon"],
             config["station_alt"]),
            (telemetry["lat"], telemetry["lon"], telemetry["alt"]))
        if info["straight_distance"] > config["max_radius_km"] * 1000:
            return "TempBlock" if config["radius_temporary_block"] else False
        if info["straight_distance"] < config["min_radius_km"] * 1000 and \
                config["radius_temporary_block"]:
            return "TempBlock"

    delta = (datetime.datetime.now(datetime.timezone.utc)
             - telemetry["datetime_dt"]).total_seconds()
    if abs(delta) > 3600 * config["sonde_time_threshold"]:
        return False

    serial = telemetry["id"]
    typ = telemetry["type"]
    vaisala_ok = bool(VAISALA_SERIAL_RE.match(serial))

    def _has_id(prefix_types):
        return any(p in typ for p in prefix_types) and \
            "x" not in serial.split("-")[-1]

    dfm_ok = _has_id(("DFM", "PS15"))
    meisei_ok = _has_id(("MEISEI", "IMS100", "RS11G"))
    mrz_ok = _has_id(("MRZ",))
    drop_ok = ("RD41" in typ or "RD94" in typ) and serial != "000000000"

    if (vaisala_ok or dfm_ok or meisei_ok or mrz_ok or drop_ok
            or "M10" in typ or "M20" in typ or "LMS" in typ
            or "IMET" in typ or "MTS01" in typ or "WXR" in typ):
        return "OK"
    return False


class RealtimeVelocityFilter:
    """Reject positions implying implausible velocity between frames
    (the reference's DFM realtime filter, decode.py:1929-1980)."""

    def __init__(self, max_velocity_ms: float = 300.0):
        self.max_velocity = max_velocity_ms
        self.last = {}

    def check(self, telemetry: dict) -> bool:
        sid = telemetry["id"]
        now = telemetry["datetime_dt"]
        pos = (telemetry["lat"], telemetry["lon"], telemetry["alt"])
        ok = True
        if sid in self.last:
            t0, p0 = self.last[sid]
            dt = (now - t0).total_seconds()
            if dt > 0:
                info = position_info(p0, pos)
                if info["straight_distance"] / dt > self.max_velocity:
                    ok = False
        if ok:
            self.last[sid] = (now, pos)
        return ok
