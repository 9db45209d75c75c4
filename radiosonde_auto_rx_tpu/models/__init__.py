"""Per-sonde-family decoder models.

Each model module exposes:
  * demod/frame constants (baud, header, frame length),
  * a stateful ``*Decoder`` class: ``decode_bits(bits, soft) -> [telemetry]``
    producing dicts in the reference JSON schema
    (reference auto_rx/autorx/decode.py:59-109),
  * an ``encode_frame`` test fixture building valid frames (the reference
    validates against recorded captures; we synthesize ground truth and
    additionally check bit-exactness against the reference C binaries when
    an oracle build is available).

Registry maps auto_rx type names to model classes.
"""

_REGISTRY = {}


def register(name):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls
    return deco


def get_model(name: str):
    # lazy imports so a single model's deps never block the others
    import radiosonde_auto_rx_tpu.models.rs41  # noqa: F401
    try:
        import radiosonde_auto_rx_tpu.models.dfm  # noqa: F401
        import radiosonde_auto_rx_tpu.models.m10  # noqa: F401
        import radiosonde_auto_rx_tpu.models.m20  # noqa: F401
        import radiosonde_auto_rx_tpu.models.imet54  # noqa: F401
        import radiosonde_auto_rx_tpu.models.mrz  # noqa: F401
        import radiosonde_auto_rx_tpu.models.lms6  # noqa: F401
        import radiosonde_auto_rx_tpu.models.meisei  # noqa: F401
        import radiosonde_auto_rx_tpu.models.mts01  # noqa: F401
        import radiosonde_auto_rx_tpu.models.imet4  # noqa: F401
        import radiosonde_auto_rx_tpu.models.weathex  # noqa: F401
        import radiosonde_auto_rx_tpu.models.rs92  # noqa: F401
        import radiosonde_auto_rx_tpu.models.dropsonde  # noqa: F401
        import radiosonde_auto_rx_tpu.models.mk2lms  # noqa: F401
    except ImportError:
        pass
    return _REGISTRY[name]


def available_models():
    get_model("RS41")
    return dict(_REGISTRY)
