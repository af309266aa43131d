from .loader import StreamingLoader, device_prefetch

__all__ = ["StreamingLoader", "device_prefetch"]
