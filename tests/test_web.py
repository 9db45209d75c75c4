"""Web server, log-file analytics, UDP listener, replay tests."""

import datetime
import json
import socket
import time
import urllib.request

import pytest

from radiosonde_auto_rx_tpu.exporters.logfile import TelemetryLogger
from radiosonde_auto_rx_tpu.station.udplistener import UDPListener
from radiosonde_auto_rx_tpu.station.emulation import replay_log_file
from radiosonde_auto_rx_tpu.web import WebExporter, WebServer
from radiosonde_auto_rx_tpu.web.log_files import (
    calculate_skewt_data, list_log_files, log_file_to_kml, read_log_file,
    zip_log_files)


def _telem(i=0):
    now = datetime.datetime.now(datetime.timezone.utc) + \
        datetime.timedelta(seconds=10 * i)
    return {
        "type": "RS41", "frame": 1000 + i, "id": "S7654321",
        "datetime": now.strftime("%Y-%m-%dT%H:%M:%SZ"), "datetime_dt": now,
        "lat": -34.0 + 0.001 * i, "lon": 138.0, "alt": 5000.0 + 50.0 * i,
        "vel_h": 12.0, "vel_v": 5.0, "heading": 100.0, "temp": -20.0,
        "humidity": 60.0, "pressure": 540.0, "batt": 2.9, "sats": 8,
        "freq": "402.500 MHz", "freq_float": 402.5,
    }


@pytest.fixture
def logdir(tmp_path):
    lg = TelemetryLogger(str(tmp_path), start_thread=False)
    for i in range(20):
        lg.write_telemetry(_telem(i))
    lg.close()
    return tmp_path


def test_log_files_roundtrip(logdir):
    files = list_log_files(str(logdir), quicklook=True)
    assert len(files) == 1
    assert files[0]["serial"] == "S7654321"
    assert files[0]["points"] == 20
    data = read_log_file(files[0]["filename"])
    assert len(data["lat"]) == 20
    assert data["type"] == "RS41"


def test_skewt(logdir):
    files = list_log_files(str(logdir))
    data = read_log_file(files[0]["filename"])
    skewt = calculate_skewt_data(data)
    assert len(skewt) == 20
    assert 500 < skewt[0]["press"] < 600
    assert skewt[0]["dwpt"] is not None
    assert skewt[0]["temp"] == -20.0


def test_kml_and_zip(logdir):
    files = list_log_files(str(logdir))
    kml = log_file_to_kml(files[0]["filename"])
    assert "<LineString>" in kml and "S7654321" in kml
    blob = zip_log_files(str(logdir))
    assert blob[:2] == b"PK"


def test_web_server_routes():
    wex = WebExporter()
    for i in range(3):
        wex.add(_telem(i))
    srv = WebServer(web_exporter=wex, config={"web_password": "secret"})
    srv.start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        arch = json.load(urllib.request.urlopen(
            base + "/get_telemetry_archive", timeout=5))
        assert "S7654321" in arch
        assert "ascent_rate" in arch["S7654321"]
        ver = json.load(urllib.request.urlopen(base + "/get_version",
                                               timeout=5))
        assert "version" in ver
        cfg = json.load(urllib.request.urlopen(base + "/get_config",
                                               timeout=5))
        assert "web_password" not in cfg
        kml = urllib.request.urlopen(base + "/rs.kml", timeout=5).read()
        assert b"<kml" in kml
        html = urllib.request.urlopen(base + "/", timeout=5).read()
        assert b"radiosonde_auto_rx_tpu" in html
    finally:
        srv.close()


def test_udp_listener():
    received = []
    lst = UDPListener(port=0 or 55999, callback=received.append)
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.sendto(json.dumps({"id": "TEST-1", "lat": 1.0}).encode(),
             ("127.0.0.1", 55999))
    s.close()
    for _ in range(20):
        if received:
            break
        time.sleep(0.1)
    lst.close()
    assert received and received[0]["id"] == "TEST-1"


def test_replay(logdir):
    files = list_log_files(str(logdir))

    class Collect:
        def __init__(self):
            self.items = []

        def add(self, t):
            self.items.append(t)

    c = Collect()
    n = replay_log_file(files[0]["filename"], [c])
    assert n == 20 and len(c.items) == 20
    assert c.items[0]["id"] == "S7654321"
