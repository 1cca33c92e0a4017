"""Component registry (``common/baseline_registry.py``): name -> class
resolution for trainers, environments, simulators, tasks, sensors, measures
and datasets, so configs select implementations by string."""

from typing import Any, Callable, Dict, Optional, Type


class Registry:
    def __init__(self):
        self._store: Dict[str, Dict[str, Any]] = {}

    def _register(self, group: str, name: Optional[str], obj: Any):
        self._store.setdefault(group, {})[name or obj.__name__] = obj
        return obj

    def _make(self, group: str, assert_base: Optional[type] = None):
        def register(to_register: Any = None, *, name: Optional[str] = None):
            def wrap(obj):
                if assert_base is not None:
                    assert issubclass(obj, assert_base), (
                        f"{obj} must subclass {assert_base}"
                    )
                return self._register(group, name, obj)

            return wrap(to_register) if to_register is not None else wrap

        return register

    def get(self, group: str, name: str):
        return self._store.get(group, {}).get(name)

    # convenience groups used across the framework
    def register_trainer(self, obj=None, *, name=None):
        return self._make("trainer")(obj, name=name)

    def get_trainer(self, name):
        return self.get("trainer", name)

    def register_env(self, obj=None, *, name=None):
        return self._make("env")(obj, name=name)

    def get_env(self, name):
        return self.get("env", name)

    def register_simulator(self, obj=None, *, name=None):
        return self._make("simulator")(obj, name=name)

    def get_simulator(self, name):
        return self.get("simulator", name)

    def register_sensor(self, obj=None, *, name=None):
        return self._make("sensor")(obj, name=name)

    def get_sensor(self, name):
        return self.get("sensor", name)

    def register_measure(self, obj=None, *, name=None):
        return self._make("measure")(obj, name=name)

    def get_measure(self, name):
        return self.get("measure", name)

    def register_dataset(self, obj=None, *, name=None):
        return self._make("dataset")(obj, name=name)

    def get_dataset(self, name):
        return self.get("dataset", name)


registry = Registry()
baseline_registry = registry  # reference-compatible alias
