from outeffhop_tpu.data.timeseries import MTSWindows, StandardScaler, load_mts_csv

__all__ = ["MTSWindows", "StandardScaler", "load_mts_csv"]
