from .dataset import DataLoader, RLHFDataset, collate_fn
from .image import process_image, smart_resize_dims
from .packing import pack_vision_batch, stack_vision_packs
from .template import build_chat_text

__all__ = ["DataLoader", "RLHFDataset", "collate_fn", "process_image",
           "smart_resize_dims", "pack_vision_batch", "stack_vision_packs", "build_chat_text"]
