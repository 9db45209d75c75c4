"""Analysis / regression tools."""
