from .server import UIServer, accelerator_stats

__all__ = ["UIServer", "accelerator_stats"]
