from .svc import SVCInference

__all__ = ["SVCInference"]
