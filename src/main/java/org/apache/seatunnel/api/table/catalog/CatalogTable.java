package org.apache.seatunnel.api.table.catalog;

/**
 * Opaque handle passed to getInlineOutputColumns (Graft shim). The
 * reference e2e snippets accept it as a parameter without touching it;
 * Graft currently passes null.
 */
public class CatalogTable {}
