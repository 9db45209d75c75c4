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
    # APRS object names are a FIXED 9-byte field: shorter ids must be
    # space-padded or every subsequent fixed-position field shifts
    # (reference aprs.py pads with ljust(9))
    _object_name = _object_name[:9].ljust(9)

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


def generate_station_object(callsign, lat, lon,
                            comment="radiosonde_auto_rx SondeGate "
                                    "v<version>",
                            icon="/r", position_report=True):
    """Station position beacon packet (reference aprs.py
    generate_station_object :166-258)."""
    from radiosonde_auto_rx_tpu import __version__
    callsign = callsign[:9].ljust(9)
    lat = float(lat)
    lat_minute = abs(lat - int(lat)) * 60.0
    lat_min_str = ("%02.4f" % lat_minute).zfill(7)[:5]
    lat_str = "%02d%s%s" % (abs(int(lat)), lat_min_str,
                            "N" if lat > 0 else "S")
    lon = float(lon)
    lon_minute = abs(lon - int(lon)) * 60.0
    lon_min_str = ("%02.4f" % lon_minute).zfill(7)[:5]
    lon_str = "%03d%s%s" % (abs(int(lon)), lon_min_str,
                            "W" if lon < 0 else "E")
    lat_prec = chr(int(round(float(("%02.4f" % lat_minute)[-2:]) / 1.10))
                   + 33)
    lon_prec = chr(int(round(float(("%02.4f" % lon_minute)[-2:]) / 1.10))
                   + 33)
    datum = "!w%s%s!" % (lat_prec, lon_prec)
    comment = comment.replace("<version>", __version__)
    if position_report:
        # timestamp-less position report (APRS101 p.32), as the reference
        # now emits for radiosondy.info compatibility
        return "!%s%s%s%s%s %s" % (lat_str, icon[0], lon_str, icon[1],
                                   comment, datum)
    ts = time.strftime("%H%M%S", time.gmtime())
    return ";%s*%sh%s%s%s%s%s %s" % (callsign, ts, lat_str, icon[0],
                                     lon_str, icon[1], comment, datum)


class APRSUploader:
    """Queue-fed APRS-IS uploader (network side is best-effort)."""

    def __init__(self, aprs_callsign="N0CALL", aprs_passcode="00000",
                 server="radiosondy.info", port=14580,
                 object_name_override="<id>", object_comment="Radiosonde",
                 position_report=False, upload_rate=30,
                 callsign_validity_threshold=5, start_thread=True,
                 station_beacon=False, station_beacon_rate=30,
                 station_beacon_position=(0.0, 0.0, 0.0),
                 station_beacon_comment="radiosonde_auto_rx SondeGate "
                                        "v<version>",
                 station_beacon_icon="/r"):
        self.station_beacon = dict(
            enabled=station_beacon, rate=station_beacon_rate,
            position=station_beacon_position,
            comment=station_beacon_comment, icon=station_beacon_icon)
        self._last_beacon = 0.0
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
            self.beacon_station_position()

    def update_station_position(self, lat, lon, alt):
        """GPSD hook (reference aprs.py:587-589)."""
        self.station_beacon["position"] = (lat, lon, alt)

    def beacon_station_position(self):
        """Upload the station position beacon on its own cadence
        (reference aprs.py beacon_station_position :560-585)."""
        if not self.station_beacon["enabled"]:
            return
        if time.time() - self._last_beacon < \
                self.station_beacon["rate"] * 60:
            return
        lat, lon = self.station_beacon["position"][:2]
        self._last_beacon = time.time()
        if lat == 0.0 and lon == 0.0:
            return      # reference refuses to beacon a 0,0 position
        pkt = generate_station_object(
            self.callsign, lat, lon, self.station_beacon["comment"],
            self.station_beacon["icon"], position_report=True)
        self.upload_packet(pkt)

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
