package org.apache.seatunnel.transform.common;

/**
 * Legacy import location for the row accessor — older reference e2e
 * snippets (single_java_path_compile.conf,
 * single_dynamic_java_compile_transform_compatible.conf) import it from
 * here. Subclassing keeps one runtime instance assignable to either
 * declared parameter type.
 */
public class SeaTunnelRowAccessor
        extends org.apache.seatunnel.api.table.type.SeaTunnelRowAccessor {
    public SeaTunnelRowAccessor(Object[] fields) {
        super(fields);
    }
}
