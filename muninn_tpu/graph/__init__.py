"""Graph analytics layer over a device-resident CSR."""
