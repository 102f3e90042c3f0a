"""Dataset factory (reference: tools/ds_tool/)."""
