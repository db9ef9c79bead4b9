from .scheduler import GenRequest, Scheduler
