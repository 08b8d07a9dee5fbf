from cartseg_tpu.utils.io import CSVLogger, JSONHistory, write_json, read_json

__all__ = ["CSVLogger", "JSONHistory", "write_json", "read_json"]
