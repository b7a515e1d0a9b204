from .miou import MIoUMetric, confusion_matrix, miou_from_confusion

__all__ = ["MIoUMetric", "confusion_matrix", "miou_from_confusion"]
