"""Optional-dependency signalling (reference ``utils/exceptions.py``)."""


class NotAvailableException(Exception):
    """Raised when an optional capability's dependencies are absent in this
    environment (e.g. a real ``carla`` client, pyrender for SMPL meshes)."""

    def __init__(self, functionality_name: str, optional_group_name: str):
        self.functionality_name = functionality_name
        self.optional_group_name = optional_group_name
        super().__init__(
            f"{functionality_name} is not available; it requires the "
            f"optional '{optional_group_name}' dependencies.")
