from .base import TaskModel
