from .row_write import masked_row_write

__all__ = ["masked_row_write"]
