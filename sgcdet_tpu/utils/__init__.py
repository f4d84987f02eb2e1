from .visualize import dump_show_results, draw_boxes_2d

__all__ = ["dump_show_results", "draw_boxes_2d"]
