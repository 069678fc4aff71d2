from .vis_pipnet import vizualize_network, get_img_coordinates

__all__ = ["vizualize_network", "get_img_coordinates"]
