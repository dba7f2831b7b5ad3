package org.apache.seatunnel.api.table.type;

/**
 * Read-only row view passed to DynamicCompile user code (Graft shim of the
 * reference's public accessor used by
 * seatunnel-transforms-v2/.../dynamiccompile/ snippets).
 */
public class SeaTunnelRowAccessor {
    private final Object[] fields;

    public SeaTunnelRowAccessor(Object[] fields) {
        this.fields = fields;
    }

    public int getArity() {
        return fields.length;
    }

    public Object getField(int pos) {
        return fields[pos];
    }

    public Object[] getFields() {
        return fields;
    }
}
