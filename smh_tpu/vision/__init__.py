"""Vision subsystem: backends (numpy oracle + TPU), pipeline driver, LSD."""
