"""APRS-IS exporter: position/object packet formatting + igate upload.

Packet format matches the reference (reference auto_rx/autorx/aprs.py
telemetry_to_aprs_position :20-165: DDMM.MM coordinates, base-91 added
precision datum, course/speed in knots, altitude in feet); upload is a
plain TCP login to an APRS-IS igate (:415-560) with a synchronized upload
timer (:642).
"""

import socket
import threading
import time

from radiosonde_auto_rx_tpu.utils.serial import strip_sonde_serial


def telemetry_to_aprs_position(sonde_data, object_name="<id>",
                               aprs_comment="Radiosonde", position_report=False):
    """Telemetry dict -> (packet_str, object_name)."""
    if object_name == "<id>":
        _object_name = sonde_data.get("aprsid")
        if _object_name is None:
            return None, None
    else:
        _object_name = object_name

    if "f_centre" in sonde_data:
        _freq = "%.3f MHz" % (round(sonde_data["f_centre"] / 1e3) / 1e3)
    else:
        _freq = sonde_data.get("freq", "")

    c = aprs_comment
    c = c.replace("<freq>", _freq)
    c = c.replace("<id>", strip_sonde_serial(sonde_data["id"]))
    c = c.replace("<temp>", "%.1fC" % sonde_data.get("temp", -273.0))
    c = c.replace("<pressure>", "%.1fhPa" % sonde_data.get("pressure", -1))
    c = c.replace("<humidity>", "%.1f" % sonde_data.get("humidity", -1) + "%")
    c = c.replace("<batt>", "%.1fV" % sonde_data.get("batt", -1))
    c = c.replace("<vel_v>", "%.1fm/s" % sonde_data.get("vel_v", 0.0))
    c = c.replace("<type>", sonde_data["type"])

    lat = float(sonde_data["lat"])
    lat_minute = abs(lat - int(lat)) * 60.0
    lat_min_str = ("%02.4f" % lat_minute).zfill(7)[:5]
    lat_str = "%02d%s%s" % (abs(int(lat)), lat_min_str,
                            "N" if lat > 0 else "S")
    lon = float(sonde_data["lon"])
    lon_minute = abs(lon - int(lon)) * 60.0
    lon_min_str = ("%02.4f" % lon_minute).zfill(7)[:5]
    lon_str = "%03d%s%s" % (abs(int(lon)), lon_min_str,
                            "W" if lon < 0 else "E")

    # base-91 added precision (aprs.py:108-122)
    lat_prec = chr(int(round(float(("%02.4f" % lat_minute)[-2:]) / 1.10)) + 33)
    lon_prec = chr(int(round(float(("%02.4f" % lon_minute)[-2:]) / 1.10)) + 33)
    datum = "!w%s%s!" % (lat_prec, lon_prec)

    alt_ft = int(float(sonde_data["alt"]) / 0.3048)
    ts = sonde_data["datetime_dt"].strftime("%H%M%S")
    if "heading" in sonde_data and "vel_h" in sonde_data:
        course_speed = "%03d/%03d" % (int(sonde_data["heading"]) % 360,
                                      int(sonde_data["vel_h"] * 1.944))
    else:
        course_speed = "000/000"

    if position_report:
        out = "/%sh%s/%sO%s/A=%06d %s %s" % (
            ts, lat_str, lon_str, course_speed, alt_ft, c, datum)
    else:
        out = ";%s*%sh%s/%sO%s/A=%06d %s %s" % (
            _object_name, ts, lat_str, lon_str, course_speed, alt_ft, c,
            datum)
    return out, _object_name.strip()


class APRSUploader:
    """Queue-fed APRS-IS uploader (network side is best-effort)."""

    def __init__(self, aprs_callsign="N0CALL", aprs_passcode="00000",
                 server="radiosondy.info", port=14580,
                 object_name_override="<id>", object_comment="Radiosonde",
                 position_report=False, upload_rate=30,
                 callsign_validity_threshold=5, start_thread=True):
        self.callsign = aprs_callsign
        self.passcode = aprs_passcode
        self.server = server
        self.port = port
        self.object_name_override = object_name_override
        self.object_comment = object_comment
        self.position_report = position_report
        self.upload_rate = upload_rate
        self.callsign_validity_threshold = callsign_validity_threshold
        self.observed_payloads = {}
        self.latest = {}
        self.running = False
        self._thread = None
        if start_thread:
            self.running = True
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def add(self, telemetry: dict):
        sid = telemetry["id"]
        self.observed_payloads[sid] = self.observed_payloads.get(sid, 0) + 1
        if self.observed_payloads[sid] >= self.callsign_validity_threshold:
            self.latest[sid] = telemetry.copy()

    def _loop(self):
        while self.running:
            time.sleep(self.upload_rate)
            for sid, telem in list(self.latest.items()):
                pkt, name = telemetry_to_aprs_position(
                    telem, self.object_name_override, self.object_comment,
                    self.position_report)
                if pkt:
                    self.upload_packet(pkt)
                del self.latest[sid]

    def upload_packet(self, packet: str):
        """One login + packet to the igate (reference aprs.py:415-500)."""
        try:
            s = socket.create_connection((self.server, self.port), timeout=10)
            s.recv(1024)
            login = "user %s pass %s vers radiosonde_auto_rx_tpu 0.1\r\n" % (
                self.callsign, self.passcode)
            s.sendall(login.encode())
            s.recv(1024)
            frame = "%s>APRARX,SONDEGATE,TCPIP,qAR,%s:%s\r\n" % (
                self.callsign, self.callsign, packet)
            s.sendall(frame.encode())
            s.close()
            return True
        except OSError:
            return False

    def close(self):
        self.running = False
        if self._thread:
            self._thread.join(timeout=2)
