from light_whisper_tpu.runtime.server import EngineServer, ServerHooks

__all__ = ["EngineServer", "ServerHooks"]
