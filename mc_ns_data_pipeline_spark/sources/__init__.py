"""Source connectors: paginated REST, contract file readers, state readers."""
