from .cvi import Sites, from_natural, init_sites, natgrad_update, to_natural
