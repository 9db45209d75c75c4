"""Demodulators: block-parallel FSK/AFSK cores and bit/frame framing."""

from radiosonde_auto_rx_tpu.demod.fsk import FSKConfig, FSKState, fsk_demod_stream
