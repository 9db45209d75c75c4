"""``python -m radiosonde_auto_rx_tpu`` — run the station CLI."""

import sys

from radiosonde_auto_rx_tpu.station.main import main

sys.exit(main())
