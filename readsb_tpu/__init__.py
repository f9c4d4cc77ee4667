"""readsb-tpu: TPU-native Mode-S/ADS-B framework."""

__version__ = "0.1.0"
