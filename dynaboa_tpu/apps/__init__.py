"""Entry points (layer L6): benchmark, internet, stream, process_data."""
